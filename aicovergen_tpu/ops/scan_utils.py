"""Blockwise associative scans.

`jax.lax.associative_scan` lowers to a log-depth tree of slice/concat ops
over the full sequence; for multi-hundred-thousand-element audio signals the
TPU (Mosaic) compile time explodes.  This module evaluates the same prefix
scan in fixed-size blocks: the inner block uses the associative tree
(bounded, fast to compile), the outer loop is a single `lax.scan` While op
whose compile time is independent of sequence length.

The caller supplies the monoid identity so carries compose across blocks.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def blockwise_associative_scan(
    combine: Callable,
    elems,
    identity,
    block: int = 8192,
):
    """Prefix scan of `combine` over the leading axis of an elems pytree.

    combine((a1, ...), (a2, ...)) must be associative; identity is its
    neutral element (scalars or arrays broadcastable to the element shape).
    Returns a pytree of the same structure/shape as elems with inclusive
    prefix results.
    """
    leaves = jax.tree_util.tree_leaves(elems)
    t = leaves[0].shape[0]
    if t <= block:
        return jax.lax.associative_scan(combine, elems)

    n_blocks = -(-t // block)
    pad = n_blocks * block - t

    def pad_leaf(x, ident):
        if pad == 0:
            return x
        fill = jnp.broadcast_to(jnp.asarray(ident, x.dtype), (pad,) + x.shape[1:])
        return jnp.concatenate([x, fill], axis=0)

    padded = jax.tree_util.tree_map(pad_leaf, elems, identity)
    blocked = jax.tree_util.tree_map(
        lambda x: x.reshape((n_blocks, block) + x.shape[1:]), padded
    )

    def outer(carry, blk):
        prefix = jax.lax.associative_scan(combine, blk)
        # combine carry with every prefix element (broadcast over the block)
        carry_b = jax.tree_util.tree_map(
            lambda c, p: jnp.broadcast_to(c, p.shape), carry, prefix
        )
        combined = combine(carry_b, prefix)
        new_carry = jax.tree_util.tree_map(lambda p: p[-1], combined)
        return new_carry, combined

    init_carry = jax.tree_util.tree_map(
        lambda x, ident: jnp.broadcast_to(jnp.asarray(ident, x.dtype), x.shape[1:]),
        padded, identity,
    )
    _, out = jax.lax.scan(outer, init_carry, blocked)
    out = jax.tree_util.tree_map(
        lambda x: x.reshape((n_blocks * block,) + x.shape[2:])[:t], out
    )
    return out


def first_order_linear_scan(a: jnp.ndarray, b: jnp.ndarray, block: int = 8192):
    """y[n] = a[n] * y[n-1] + b[n] with y[-1] = 0 over the leading axis.
    a, b: (T, ...) broadcast-compatible."""

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, b1 * a2 + b2

    _, y = blockwise_associative_scan(
        combine, (a, b), (jnp.ones(()), jnp.zeros(())), block=block
    )
    return y


def max_decay_scan(decay: jnp.ndarray, x: jnp.ndarray, block: int = 8192):
    """y[n] = max(x[n], decay[n] * y[n-1]) over the leading axis."""

    def combine(left, right):
        d1, m1 = left
        d2, m2 = right
        return d1 * d2, jnp.maximum(m1 * d2, m2)

    _, y = blockwise_associative_scan(
        combine, (decay, x), (jnp.ones(()), jnp.full((), -jnp.inf)), block=block
    )
    return y


def matrix_linear_scan(A: jnp.ndarray, b_seq: jnp.ndarray, z0: jnp.ndarray, block: int = 4096):
    """z[n] = A z[n-1] + b_seq[n], constant (N, N) A, b_seq (T, N), z0 (N,)."""
    n = A.shape[0]
    T = b_seq.shape[0]

    def combine(left, right):
        A1, c1 = left
        A2, c2 = right
        return jnp.matmul(A2, A1), jnp.einsum("...ij,...j->...i", A2, c1) + c2

    b0 = b_seq.at[0].add(jnp.matmul(A, z0))
    A_seq = jnp.broadcast_to(A, (T, n, n))
    _, z = blockwise_associative_scan(
        combine, (A_seq, b0), (jnp.eye(n, dtype=A.dtype), jnp.zeros((n,), A.dtype)),
        block=block,
    )
    return z
