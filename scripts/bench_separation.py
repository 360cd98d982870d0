"""Separation-stage micro-benchmark (VERDICT r05 task 2 instrumentation).

Times the conv-TDF separation path in isolation on the live backend:
  * net-only forward (denoise batch) per batch size — MXU/HBM utilization,
  * STFT/iSTFT pair alone,
  * full separate() per stage model at a given song length.

Prints seconds + effective TFLOP/s so the gap to speed-of-light is visible.
Usage: python scripts/bench_separation.py [--seconds 120] [--batches 4,8,16]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[..., :2].astype(jnp.float32)))


def time_call(fn, reps=3):
    fn()  # warm (compile/load)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def conv_tdf_flops(spec, rows: int) -> float:
    """Approximate MAC count of one conv-TDF forward for `rows` spectrogram
    rows (B dimension of the net)."""
    g, f, t = spec.g, spec.dim_f, spec.dim_t
    total = 0.0
    c = g
    # first 1x1
    total += spec.in_ch * g * f * t
    scales = []
    for i in range(spec.n_scales):
        scales.append((c, f, t))
        total += spec.tfc * 9 * c * c * f * t  # tfc convs
        bf = max(f // spec.bn_factor, 4)
        total += 2 * c * f * bf * t  # TDF linears
        total += 4 * c * (c + g) * (f // 2) * (t // 2)  # down k=2 s=2
        c += g
        f //= 2
        t //= 2
    total += spec.tfc * 9 * c * c * f * t + 2 * c * f * max(f // spec.bn_factor, 4) * t
    for (cs, fs, ts) in reversed(scales):
        total += 4 * c * cs * fs * ts  # up
        c = cs
        total += spec.tfc * 9 * c * c * fs * ts
        bf = max(fs // spec.bn_factor, 4)
        total += 2 * c * fs * bf * ts
    total += c * spec.in_ch * spec.dim_f * spec.dim_t
    return 2.0 * total * rows  # MACs -> FLOPs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--batches", default="4,8,16")
    ap.add_argument("--model", default="UVR-MDX-NET-Voc_FT.onnx")
    args = ap.parse_args()

    from aicovergen_tpu.utils.platform import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)

    import bench
    from aicovergen_tpu.io.assets import AssetStore, mdx_params_for
    from aicovergen_tpu.models.conv_tdf import ConvTDFSpec
    from aicovergen_tpu.models.mdx import load_mdx_model
    from aicovergen_tpu.ops.stft import hann_window
    from aicovergen_tpu.pipeline.separate import (
        MDXParams, chunk_wave, make_chunk_runner, separate, spec_pack, spec_unpack,
    )
    from aicovergen_tpu.utils.config import default_config

    base = bench._build_assets()
    store = AssetStore(base)
    path = store.mdx_model_path(args.model)
    params = mdx_params_for(path)
    model_fn = load_mdx_model(path)
    runtime = default_config()
    cdtype = runtime.compute_dtype if runtime.use_bf16 else None
    print(f"model={args.model} dim_f={params.dim_f} dim_t={params.dim_t} "
          f"n_fft={params.n_fft} chunk={params.chunk_size} "
          f"compute_dtype={cdtype}", file=sys.stderr)

    spec = ConvTDFSpec(dim_f=params.dim_f, dim_t=params.dim_t)

    # --- net-only (denoise program: 2*rows through the net, one iSTFT)
    rng = np.random.default_rng(0)
    for b in (int(x) for x in args.batches.split(",")):
        runner = make_chunk_runner(model_fn, params, batch_size=b,
                                   compute_dtype=cdtype)
        rows = b if b == 1 else b // 2  # denoise dispatch group
        chunks = rng.standard_normal((rows, 2, params.chunk_size)).astype(np.float16)
        xb = jnp.asarray(chunks)
        sync(xb)

        # time the public runner on a device-resident input (no transfer in
        # the loop)
        def net_pass():
            out = runner(xb, denoise=True)
            sync(out)

        dt = time_call(net_pass)
        fl = conv_tdf_flops(spec, 2 * rows)
        print(f"net b={b} rows(denoise)={2*rows}: {dt*1e3:8.1f} ms  "
              f"{fl/dt/1e12:6.2f} TFLOP/s  ({fl/1e9:.0f} GFLOP)")

    # --- STFT/iSTFT pair alone at batch 8
    window = hann_window(params.n_fft)
    x8 = jnp.asarray(rng.standard_normal((8, 2, params.chunk_size)).astype(np.float32))
    sync(x8)

    @jax.jit
    def stft_pair(x):
        s = spec_pack(x, params.n_fft, params.hop, window, params.dim_f)
        return spec_unpack(s, params.n_fft, params.hop, window, params.chunk_size)

    dt = time_call(lambda: sync(stft_pair(x8)))
    print(f"stft+istft b=8: {dt*1e3:8.1f} ms")

    # --- full separate() per stage at song length
    sr = 44100
    t = np.arange(int(args.seconds * sr)) / sr
    wave = np.stack([np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 165 * t)]).astype(np.float32)
    n_chunks = chunk_wave(wave, params)[0].shape[0]
    for name in ("UVR-MDX-NET-Voc_FT.onnx", "UVR_MDXNET_KARA_2.onnx",
                 "Reverb_HQ_By_FoxJoy.onnx"):
        p = store.mdx_model_path(name)
        prm = mdx_params_for(p)
        fn = load_mdx_model(p)
        wdev = jnp.asarray(wave)
        sync(wdev)

        def full():
            prim, comp = separate(wave, fn, prm, denoise=True, batch_size=8,
                                  compute_dtype=cdtype, device_out=True)
            sync(prim)

        def full_dev():
            prim, comp = separate(wdev, fn, prm, denoise=True, batch_size=8,
                                  compute_dtype=cdtype)
            sync(prim)

        dt_h = time_call(full, reps=2)
        dt_d = time_call(full_dev, reps=2)
        print(f"separate {name}: host-in {dt_h:6.3f}s  device-in {dt_d:6.3f}s  "
              f"(chunks/song ~{n_chunks})")


if __name__ == "__main__":
    sys.exit(main())
