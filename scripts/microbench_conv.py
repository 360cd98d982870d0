"""Layout experiment: 3x3 conv at conv-TDF dims, NCHW vs NHWC, bf16.

Also prints XLA's cost analysis for the bench conv-TDF net to compare
achieved vs theoretical FLOP/s.
"""

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
    return best


def main():
    from aicovergen_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, C, H, W = 8, 32, 3072, 256
    x_nchw = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32)).astype(jnp.bfloat16)
    x_nhwc = jnp.asarray(np.moveaxis(np.asarray(x_nchw, np.float32), 1, -1)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, C, 3, 3)).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    w_hwio = jnp.transpose(w, (2, 3, 1, 0))

    conv_nchw = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
    )
    conv_nhwc = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    t1 = timeit(conv_nchw, x_nchw, w)
    t2 = timeit(conv_nhwc, x_nhwc, w_hwio)
    flops = 2 * B * H * W * C * C * 9
    print(
        f"conv3x3 B{B} C{C} {H}x{W}: nchw={t1*1e3:.2f}ms ({flops/t1/1e12:.1f} TF/s)  "
        f"nhwc={t2*1e3:.2f}ms ({flops/t2/1e12:.1f} TF/s)"
    )

    # C=128 comparison (MXU-width channels)
    C2 = 128
    x2 = jnp.asarray(rng.standard_normal((B, H // 4, W, C2)).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C2, C2)).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    t3 = timeit(conv_nhwc, x2, w2)
    flops2 = 2 * B * (H // 4) * W * C2 * C2 * 9
    print(f"conv3x3 B{B} C{C2} {H//4}x{W}: nhwc={t3*1e3:.2f}ms ({flops2/t3/1e12:.1f} TF/s)")

    # XLA cost analysis of the bench net
    from aicovergen_tpu.models.mdx import load_mdx_model

    model_path = os.path.join(REPO, ".bench_assets", "mdxnet_models", "UVR-MDX-NET-Voc_FT.onnx")
    model_fn = load_mdx_model(model_path)
    weights = jax.device_put(model_fn.cast(jnp.bfloat16))
    spec = jnp.asarray(rng.standard_normal((B, 4, 3072, 256)).astype(np.float32)).astype(jnp.bfloat16)
    lowered = jax.jit(lambda w, s: model_fn.apply(w, s)).lower(weights, spec)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    fl = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    t_net = timeit(jax.jit(lambda w, s: model_fn.apply(w, s)), weights, spec)
    print(
        f"net: {t_net*1e3:.1f}ms  xla_flops={fl/1e9:.1f}G ({fl/t_net/1e12:.1f} TF/s)  "
        f"bytes={bytes_/1e9:.2f}G ({bytes_/t_net/1e9:.0f} GB/s)"
    )


if __name__ == "__main__":
    main()
