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


def _band_to_dense(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, T, K=2w+1) banded values -> (B, H, T, T) with
    D[t, s] = x[t, s - t + w] on the band.  Same pad/flatten/reshape skew
    family as _relative_to_absolute but K-wide instead of (2T-1)-wide —
    entries outside the band read neighboring rows and MUST be masked by
    the caller (they are, with the |s-t| <= w `inband` mask).  Pure layout
    ops: no gather, nothing wider than the dense result is materialized."""
    b, h, t, k = x.shape
    if t == 1:
        return x  # K == 1: the band IS the dense matrix
    width = k + t - 1  # padded row width; dense row stride is width-1
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))  # (B,H,T,W)
    flat = xp.reshape(b, h, t * width)
    # D[t, s] = x_flat[t*W + (s - t + w)] = x_flat[w + t*(W-1) + s]
    need = t * (width - 1)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, max(0, w + need - flat.shape[-1]))))
    return flat[..., w : w + need].reshape(b, h, t, width - 1)[..., :t]


def _dense_to_band(p_attn: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, T, T) -> (B, H, T, K=2w+1) with
    S[t, k] = p_attn[t, t + k - w]; out-of-range entries read neighboring
    rows and MUST be masked by the caller.  Inverse skew of _band_to_dense."""
    b, h, t, _ = p_attn.shape
    k = 2 * w + 1
    extra = max(0, k - (t + 1))  # row padding so the skewed row covers K cols
    pp = jnp.pad(p_attn, ((0, 0), (0, 0), (0, 0), (0, extra)))
    r = t + extra
    flat = pp.reshape(b, h, t * r)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (w, w + r)))
    # S[t, k] = flat_padded[t*(R+1) + k]  (== p_attn[t, t + k - w] in range)
    return flat[..., : t * (r + 1)].reshape(b, h, t, r + 1)[..., :k]


def _band_add_blocked(scores: jnp.ndarray, band: jnp.ndarray, w: int) -> jnp.ndarray:
    """scores (B,H,T,T) += banded values, T % 128 == 0, w < 128.

    The full-size skew (_band_to_dense) moves GB-scale buffers through
    lane-misaligned slices — measured ~170 ms per layer on the session TPU.
    Here the band is first skewed inside 128-row blocks (KB-scale flats,
    the classic reshape trick at stride 385), yielding for every row the
    values destined for its three neighboring 128-column blocks
    (dm[t, m, j] -> column (bi(t)+m-1)*128 + j); the dense add is then one
    fused broadcast-select pass over the scores."""
    b, h, t, k = band.shape
    nblk = t // 128
    pad_l = 128 - w
    row_w = 3 * 128 + 1  # 385: stride-384 reads via the reshape trick
    bp = jnp.pad(
        band.reshape(b, h, nblk, 128, k),
        ((0, 0), (0, 0), (0, 0), (0, 0), (pad_l, row_w - pad_l - k)),
    )
    flat = bp.reshape(b, h, nblk, 128 * row_w)
    # d_cat[i, c'] = flat[i*384 + c'] = band[i, c' - i - (128 - w)] (zeros
    # outside the band; c' = m*128 + j spans column-blocks bi-1, bi, bi+1)
    d_cat = flat[..., : 128 * (row_w - 1)].reshape(b, h, nblk, 128, 3, 128)
    dm = d_cat.reshape(b, h, t, 3, 128)

    bi_of_t = jnp.arange(t) // 128
    sel = (
        jnp.arange(nblk)[None, :, None]
        == bi_of_t[:, None, None] + jnp.arange(-1, 2)[None, None, :]
    )  # (T, C, 3)
    s5 = scores.reshape(b, h, t, nblk, 128)
    r5 = s5
    for m in range(3):
        r5 = r5 + dm[:, :, :, m, None, :] * sel[None, None, :, :, m, None].astype(scores.dtype)
    return r5.reshape(b, h, t, t)


def _strips_blocked(p_attn: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B,H,T,T) -> (B,H,T,2w+1) with S[t,k] = p_attn[t, t+k-w] (zeros out
    of range), T % 128 == 0, w < 128.  One einsum gathers each row's three
    neighboring 128-column blocks (reads p_attn once); the per-block
    inverse skew then runs on KB-scale flats."""
    b, h, t, _ = p_attn.shape
    nblk = t // 128
    bi_of_t = jnp.arange(t) // 128
    sel = (
        jnp.arange(nblk)[None, :, None]
        == bi_of_t[:, None, None] + jnp.arange(-1, 2)[None, None, :]
    )  # (T, C, 3)
    p5 = p_attn.reshape(b, h, t, nblk, 128)
    e = jnp.einsum("bhtcj,tcm->bhtmj", p5, sel.astype(p_attn.dtype))  # (B,H,T,3,128)
    e_cat = e.reshape(b, h, nblk, 128, 384)
    flat = jnp.pad(e_cat.reshape(b, h, nblk, 128 * 384), ((0, 0), (0, 0), (0, 0), (0, 128)))
    # sk[i, p] = e_cat[i, i + p]  (rows never wrap: i + p <= 127 + 138 < 384)
    sk = flat.reshape(b, h, nblk, 128, 385)[..., pl_start(w) : pl_start(w) + 2 * w + 1]
    return sk.reshape(b, h, t, 2 * w + 1)


def pl_start(w: int) -> int:
    """Start column of the strip window inside the stride-385 skew:
    S[t,k] = e_cat[i, i + 128 - w + k] -> p = 128 - w + k."""
    return 128 - w


def _band_table(rel_emb: jnp.ndarray, t: int, window_size: int) -> jnp.ndarray:
    """The 2*w_eff+1 usable rows of the (1, 2w+1, d) relative table — the
    same entries _get_relative_embeddings keeps (it zero-pads the rest out
    to 2t-1 diagonals)."""
    w_eff = min(window_size, t - 1)
    center = rel_emb.shape[1] // 2
    return rel_emb[0, center - w_eff : center + w_eff + 1]  # (2*w_eff+1, d)


def multi_head_attention(p, x, attn_mask, n_heads: int, window_size: int):
    """Self-attention on (B, D, T) with shared-head relative embeddings
    (reference attentions.py:216-275).

    The reference routes the relative-position terms through (T, 2T-1)
    intermediates and pad/reshape shuffles (attentions.py:313-348) — at
    song scale (T ~ 8k) that materializes multi-GB tensors that are zero
    outside the +-window band.  Here both terms stay banded: 2w+1 products
    per position, gathered onto the score diagonals / out of the attention
    rows.  The summed terms are identical (the dropped entries are exact
    zeros), so results match the reference bit-for-bit in fp."""
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

    w_eff = min(window_size, t - 1)
    blocked = t % 128 == 0 and w_eff < 128 and t >= 256
    tab_k = _band_table(p["emb_rel_k"], t, window_size)  # (K, dk)
    band_logits = jnp.einsum("bhtd,kd->bhtk", q * scale, tab_k)  # (B,H,T,K)
    if blocked:
        scores = _band_add_blocked(scores, band_logits, w_eff)
    else:
        t_idx = jnp.arange(t)[:, None]
        s_idx = jnp.arange(t)[None, :]
        inband = jnp.abs(s_idx - t_idx) <= w_eff
        scores = scores + jnp.where(
            inband[None, None], _band_to_dense(band_logits, w_eff), 0
        )

    if attn_mask is not None:
        # attn_mask is the (B, 1, T) x_mask vector: the (T, T) outer product
        # stays a broadcast inside this where — two vector reads per layer
        # instead of a materialized (B, 1, T, T) mask read 6 times over
        pair = attn_mask[:, :, :, None] * attn_mask[:, :, None, :]
        scores = jnp.where(pair == 0, -1e4, scores)
    # Manual softmax, fusion-friendly at T ~ 8k: max/sub stay in the compute
    # dtype (the scores already are), exp runs in f32 but its result is
    # stored back in the compute dtype, and the sum accumulates f32 over it
    # (XLA fuses the convert into the reduce) — in f32 this is exactly
    # jax.nn.softmax; in bf16 it avoids materializing the (B,H,T,T) tensor
    # in f32 three times over.
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32)).astype(x.dtype)
    denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    p_attn = (e.astype(jnp.float32) / denom).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)

    # out[t] += sum_{|s-t|<=w} p_attn[t, s] * rel_v[s - t + w]
    tab_v = _band_table(p["emb_rel_v"], t, window_size)
    if blocked:
        strips = _strips_blocked(p_attn, w_eff)
    else:
        t_idx = jnp.arange(t)[:, None]
        s_pos = t_idx + jnp.arange(-w_eff, w_eff + 1)[None, :]  # (T, K)
        valid = (s_pos >= 0) & (s_pos < t)
        strips = jnp.where(valid[None, None], _dense_to_band(p_attn, w_eff), 0)
    out = out + jnp.einsum("bhtk,kd->bhtd", strips, tab_v.astype(p_attn.dtype))

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
    """reference attentions.py Encoder.forward (:61-73) on (B, D, T).

    The n_layers identical layers run as one lax.scan over stacked
    per-layer params (identical numerics, layer body appears ONCE in the
    HLO) — unrolling them bloats the compiled executable, which costs both
    compile time and the per-process executable load on a remote backend."""
    attn_mask = x_mask  # (B, 1, T); layers form the (T, T) pair mask lazily
    x = x * x_mask
    layer_list = [
        {
            "attn": p["attn_layers"][str(i)],
            "n1": p["norm_layers_1"][str(i)],
            "ffn": p["ffn_layers"][str(i)],
            "n2": p["norm_layers_2"][str(i)],
        }
        for i in range(n_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)

    def body(h, lp):
        y = multi_head_attention(lp["attn"], h, attn_mask, n_heads, window_size)
        h = layer_norm(lp["n1"], h + y, axis=1)
        y = ffn(lp["ffn"], h, x_mask, kernel_size)
        h = layer_norm(lp["n2"], h + y, axis=1)
        return h, None

    x, _ = jax.lax.scan(body, x, stacked)
    return x * x_mask
