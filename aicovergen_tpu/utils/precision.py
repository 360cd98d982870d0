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
    `dtype`; integer/bool leaves pass through untouched.  Leaves become jax
    arrays (device-resident)."""

    def cast(leaf):
        a = jnp.asarray(leaf)
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a

    return jax.tree.map(cast, tree)


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
