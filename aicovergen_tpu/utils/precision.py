"""Mixed-precision helpers.

TPU MXUs natively consume bfloat16 with fp32 accumulation; the reference ran
fp16 on CUDA for the same reason (reference src/rvc.py:29-75).  The policy
here:

  * model *parameters* and matmul/conv *activations* are cast to bf16;
  * normalization statistics, softmax, FFTs, f0 phase accumulation and any
    decode arithmetic stay fp32 (handled inside the respective ops);
  * stage outputs are cast back to fp32 at the host boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cast_floats(tree, dtype):
    """Cast every floating-point leaf of a pytree (nested dict of arrays) to
    `dtype`; integer/bool leaves pass through untouched.

    Host-side numpy casts (ml_dtypes handles bf16), then ONE device_put of
    the whole tree: remote-TPU backends pay per-transfer latency, so
    per-leaf jnp casts would round-trip hundreds of times and ship fp32
    bytes; this ships half the bytes in one batched transfer."""
    np_dtype = jnp.dtype(dtype)

    def cast(leaf):
        a = np.asarray(leaf)
        if np.issubdtype(a.dtype, np.floating):
            return a.astype(np_dtype)
        return a

    return jax.device_put(jax.tree.map(cast, tree))


def tree_dtype(tree, default=jnp.float32):
    """The dtype of the first floating leaf in a param tree."""
    for leaf in jax.tree.leaves(tree):
        d = np.asarray(leaf).dtype if not hasattr(leaf, "dtype") else leaf.dtype
        if jnp.issubdtype(d, jnp.floating):
            return d
    return default


def upcast_dtype(dtype):
    """fp32 (or wider) compute dtype for precision-sensitive reductions:
    bf16/fp16 are widened to fp32, fp32/fp64 stay as-is."""
    return jnp.promote_types(dtype, jnp.float32)


def pad_to_bucket(x: np.ndarray, bucket: int, mode: str = "reflect"):
    """Pad the last axis up to the next multiple of `bucket` so eager/jit
    device stages see a small set of static lengths instead of one program
    per song length (a fresh length costs a full recompile on every
    primitive it touches).  Returns (padded, true_len)."""
    n = x.shape[-1]
    pad = (-n) % bucket
    if pad == 0:
        return x, n
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    if mode == "reflect" and pad >= n:
        mode = "constant"  # numpy reflect cannot exceed the signal length
    return np.pad(x, widths, mode=mode), n
