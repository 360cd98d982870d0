"""Bisect the encoder attention cost at song scale: QK -> +softmax/AV ->
+mask -> +rel-pos band, amortized (k applies per jit call)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from aicovergen_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from aicovergen_tpu.models.attention import (_band_add_blocked, _band_to_dense,
        _dense_to_band, _strips_blocked)

    B, H, T, DK = 4, 2, 7808, 96
    W = 10
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, DK)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, DK)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, DK)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    tab = jnp.asarray(rng.standard_normal((2 * W + 1, DK)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    mask = jnp.ones((B, 1, T), jnp.bfloat16)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:2]))

    def timeit(fn, *args, reps=3):
        out = fn(*args); sync(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); out = fn(*args); sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    @jax.jit
    def qk_only(q, k):
        return jnp.einsum("bhtd,bhsd->bhts", q, k)

    t = timeit(qk_only, q, k)
    print(f"QK einsum: {t*1e3:.1f}ms", flush=True)

    @jax.jit
    def soft_av(q, k, v):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.float32)).astype(q.dtype)
        d = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        p = (e.astype(jnp.float32) / d).astype(q.dtype)
        return jnp.einsum("bhts,bhsd->bhtd", p, v)

    t = timeit(soft_av, q, k, v)
    print(f"QK+softmax+AV: {t*1e3:.1f}ms", flush=True)

    @jax.jit
    def with_mask(q, k, v, mask):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k)
        pair = mask[:, :, :, None] * mask[:, :, None, :]
        s = jnp.where(pair == 0, -1e4, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.float32)).astype(q.dtype)
        d = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        p = (e.astype(jnp.float32) / d).astype(q.dtype)
        return jnp.einsum("bhts,bhsd->bhtd", p, v)

    t = timeit(with_mask, q, k, v, mask)
    print(f"+mask: {t*1e3:.1f}ms", flush=True)

    @jax.jit
    def full(q, k, v, mask, tab):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k)
        band = jnp.einsum("bhtd,kd->bhtk", q, tab)
        s = _band_add_blocked(s, band, W)
        pair = mask[:, :, :, None] * mask[:, :, None, :]
        s = jnp.where(pair == 0, -1e4, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.float32)).astype(q.dtype)
        d = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        p = (e.astype(jnp.float32) / d).astype(q.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", p, v)
        strips = _strips_blocked(p, W)
        return out + jnp.einsum("bhtk,kd->bhtd", strips, tab)

    t = timeit(full, q, k, v, mask, tab)
    print(f"full (band+mask): {t*1e3:.1f}ms  [x6 layers = {6*t*1e3:.0f}ms]", flush=True)


if __name__ == "__main__":
    main()
