"""Windowed relative-position multi-head attention encoder (VITS-style).

Functional JAX port of the reference transformer used by the RVC text
encoder: 6 layers, 2 heads, hidden 192, FFN 768, relative-position window 10
(reference src/infer_pack/attentions.py:13-73, 162-359).  The
relative<->absolute index shuffles are reproduced with the same pad/reshape
tricks, which XLA compiles to pure data movement.

Dropout is omitted: only the inference path exists in the product
(reference uses .infer()/eval mode throughout).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .layers import conv1d, layer_norm


def _get_relative_embeddings(rel_emb: jnp.ndarray, length: int, window_size: int):
    """reference attentions.py:295-311 — slice/pad the (1, 2w+1, d) table to
    (1, 2*length-1, d)."""
    pad_length = max(length - (window_size + 1), 0)
    slice_start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        rel_emb = jnp.pad(rel_emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return rel_emb[:, slice_start : slice_start + 2 * length - 1]


def _relative_to_absolute(x: jnp.ndarray):
    """(B, H, L, 2L-1) -> (B, H, L, L)  (reference attentions.py:313-332)."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, length * 2 * length)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, length - 1)))
    x_final = x_flat.reshape(b, h, length + 1, 2 * length - 1)
    return x_final[:, :, :length, length - 1 :]


def _absolute_to_relative(x: jnp.ndarray):
    """(B, H, L, L) -> (B, H, L, 2L-1)  (reference attentions.py:334-348)."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, length - 1)))
    x_flat = x.reshape(b, h, length * length + length * (length - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (length, 0)))
    return x_flat.reshape(b, h, length, 2 * length)[:, :, :, 1:]


def multi_head_attention(p, x, attn_mask, n_heads: int, window_size: int):
    """Self-attention on (B, D, T) with shared-head relative embeddings
    (reference attentions.py:216-275)."""
    b, d, t = x.shape
    k_channels = d // n_heads

    q = conv1d(p["conv_q"], x)
    k = conv1d(p["conv_k"], x)
    v = conv1d(p["conv_v"], x)

    def split_heads(z):  # (B, D, T) -> (B, H, T, dk)
        return z.reshape(b, n_heads, k_channels, t).swapaxes(2, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scale = 1.0 / math.sqrt(k_channels)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)

    rel_k = _get_relative_embeddings(p["emb_rel_k"], t, window_size)  # (1, 2t-1, dk)
    rel_logits = jnp.einsum("bhtd,omd->bhtm", q * scale, rel_k[0][None])
    scores = scores + _relative_to_absolute(rel_logits)

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, -1e4, scores)
    # softmax in >=fp32 (bf16 exponent sums lose mass on long rows)
    p_attn = jax.nn.softmax(scores.astype(jnp.promote_types(x.dtype, jnp.float32)), axis=-1)
    p_attn = p_attn.astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)

    rel_weights = _absolute_to_relative(p_attn)  # (B, H, T, 2T-1)
    rel_v = _get_relative_embeddings(p["emb_rel_v"], t, window_size)
    out = out + jnp.einsum("bhtm,omd->bhtd", rel_weights, rel_v[0][None])

    out = out.swapaxes(2, 3).reshape(b, d, t)
    return conv1d(p["conv_o"], out)


def ffn(p, x, x_mask, kernel_size: int):
    """Conv1d FFN with "same" asymmetric padding
    (reference attentions.py:362-417, non-causal, relu)."""

    def pad_same(z):
        if kernel_size == 1:
            return z
        pad_l = (kernel_size - 1) // 2
        pad_r = kernel_size // 2
        return jnp.pad(z, ((0, 0), (0, 0), (pad_l, pad_r)))

    x = conv1d(p["conv_1"], pad_same(x * x_mask))
    x = jax.nn.relu(x)
    x = conv1d(p["conv_2"], pad_same(x * x_mask))
    return x * x_mask


def encoder(p, x, x_mask, n_heads: int, n_layers: int, kernel_size: int, window_size: int = 10):
    """reference attentions.py Encoder.forward (:61-73) on (B, D, T)."""
    attn_mask = x_mask[:, :, None, :] * x_mask[:, :, :, None]  # (B,1,T,T)
    x = x * x_mask
    for i in range(n_layers):
        si = str(i)
        y = multi_head_attention(p["attn_layers"][si], x, attn_mask, n_heads, window_size)
        x = layer_norm(p["norm_layers_1"][si], x + y, axis=1)
        y = ffn(p["ffn_layers"][si], x, x_mask, kernel_size)
        x = layer_norm(p["norm_layers_2"][si], x + y, axis=1)
    return x * x_mask
