"""Micro-benchmark: where does a separation batch spend its device time?

Times STFT-only, net-only, iSTFT-only and the fused chunk program on the
bench conv-TDF replica at real UVR dims (Voc_FT class), on whatever backend
is active.  Run on the TPU session:  python scripts/microbench_separate.py
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
    fn(*args)  # compile
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

    from aicovergen_tpu.models.mdx import load_mdx_model
    from aicovergen_tpu.ops.stft import hann_window
    from aicovergen_tpu.pipeline.separate import MDXParams, spec_pack, spec_unpack

    print(f"devices: {jax.devices()}", file=sys.stderr)
    params = MDXParams(dim_f=3072, dim_t=256, n_fft=7680, compensation=1.021)
    batch = int(os.environ.get("MB_BATCH", 8))
    model_path = os.path.join(REPO, ".bench_assets", "mdxnet_models", "UVR-MDX-NET-Voc_FT.onnx")
    model_fn = load_mdx_model(model_path)
    weights = jax.device_put(model_fn.cast(jnp.bfloat16))

    window = hann_window(params.n_fft)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 2, params.chunk_size)).astype(np.float32))
    spec = jax.jit(
        lambda x: spec_pack(x, params.n_fft, params.hop, window, params.dim_f)
    )(x)
    spec_bf16 = spec.astype(jnp.bfloat16)

    stft_fn = jax.jit(lambda x: spec_pack(x, params.n_fft, params.hop, window, params.dim_f))
    net_fn = jax.jit(lambda w, s: model_fn.apply(w, s))
    istft_fn = jax.jit(
        lambda s: spec_unpack(s.astype(jnp.float32), params.n_fft, params.hop, window, params.chunk_size)
    )

    t_stft = timeit(stft_fn, x)
    t_net = timeit(net_fn, weights, spec_bf16)
    t_istft = timeit(istft_fn, spec)

    def fused(w, x):
        s = stft_fn(x)
        o = net_fn(w, s.astype(jnp.bfloat16))
        return istft_fn(o)

    t_fused = timeit(fused, weights, x)
    print(
        f"batch={batch} chunk={params.chunk_size}  "
        f"stft={t_stft*1e3:.1f}ms  net={t_net*1e3:.1f}ms  "
        f"istft={t_istft*1e3:.1f}ms  fused={t_fused*1e3:.1f}ms"
    )


if __name__ == "__main__":
    main()
