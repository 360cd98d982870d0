"""Verify + time the Pallas 3x3 conv against lax.conv on the session TPU."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sync(x):
    import jax.numpy as jnp

    float(jnp.sum(x.astype(jnp.float32)[..., :2]))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from aicovergen_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from aicovergen_tpu.ops.pallas_conv import conv3x3_nchw, conv3x3_supported

    rng = np.random.default_rng(0)
    for (B, C_in, C_out, H, W) in [
        (8, 4, 32, 3072, 256),
        (8, 32, 32, 3072, 256),
        (8, 64, 64, 1536, 128),
    ]:
        x = jnp.asarray(rng.standard_normal((B, C_in, H, W)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal((C_out, C_in, 3, 3)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((C_out,)).astype(np.float32)).astype(jnp.bfloat16)
        assert conv3x3_supported(x.shape, w.shape, (1, 1), (1, 1), ((1, 1), (1, 1)), 1, x.dtype)

        ref_fn = jax.jit(
            lambda x, w, b: jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            + b.reshape(1, -1, 1, 1)
        )
        t_ref, y_ref = timeit(ref_fn, x, w, b)
        t_pal, y_pal = timeit(conv3x3_nchw, x, w, b)
        diff = float(
            jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_pal.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) or 1.0
        flops = 2 * B * H * W * 9 * C_in * C_out
        print(
            f"B{B} {C_in}->{C_out} {H}x{W}: lax={t_ref*1e3:.2f}ms ({flops/t_ref/1e12:.1f} TF/s)  "
            f"pallas={t_pal*1e3:.2f}ms ({flops/t_pal/1e12:.1f} TF/s)  "
            f"rel_err={diff/scale:.2e}"
        )


if __name__ == "__main__":
    main()
