"""Amortized breakdown of the RVC synthesizer stage at cover-bench scale.

Times (netting the ~28 ms tunnel RTT): noise generation, text encoder +
flow, windowed NSF decoder, and the full synthesizer_infer, on the bench
fixture weights at the 120 s-cover segment-batch shape.
"""

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

    from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest
    from aicovergen_tpu.models.rvc import (
        RVCConfig, text_encoder, flow_reverse, generator_nsf_windowed, embedding,
    )
    from aicovergen_tpu.utils.precision import cast_floats

    def _load_flat(npz_path, drop_prefixes=()):
        data = np.load(npz_path)
        flat = {k[3:]: data[k] for k in data.files if k.startswith("sd:")}
        return {k: v for k, v in flat.items()
                if not any(k.startswith(p) for p in drop_prefixes)
                and not k.endswith("num_batches_tracked")}

    fixtures = os.path.join(REPO, "tests", "fixtures")
    params = nest(fold_weight_norm(_load_flat(
        os.path.join(fixtures, "rvc_synth_v2f0.npz"), drop_prefixes=("enc_q.",))))
    params = cast_floats(params, jnp.bfloat16)
    cfg = RVCConfig(version="v2", if_f0=True)

    rows, frames = 4, 3904  # ~bench shape (frames % 64 == 0: blocked band path)
    t2 = frames * 2
    rng = np.random.default_rng(0)
    phone = jnp.asarray(rng.standard_normal((rows, t2, 768)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    lengths = jnp.asarray(np.full((rows,), t2))
    pitch = jnp.asarray(rng.integers(1, 255, (rows, t2)))
    nsff0 = jnp.asarray(rng.uniform(80, 400, (rows, t2)).astype(np.float32))
    sid = jnp.asarray(np.zeros((rows,), np.int32))
    key = jax.random.PRNGKey(0)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:2]))

    def timeit(fn, *args, reps=4):
        out = jax.block_until_ready(fn(*args)); sync(jax.tree_util.tree_leaves(out)[0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    # 1) noise generation alone
    @jax.jit
    def noise_fn(rng_):
        def row_noise(i):
            k1, k2 = jax.random.split(jax.random.fold_in(rng_, i))
            return (
                jax.random.normal(k1, (cfg.inter_channels, t2), jnp.bfloat16),
                jax.random.normal(k2, (t2 * cfg.upp, 1), jnp.float32),
            )
        return jax.vmap(row_noise)(jnp.arange(rows))

    t = timeit(noise_fn, key)
    print(f"noise gen: {t*1e3:.1f}ms", flush=True)
    zp_noise, sine_noise = noise_fn(key)

    # 2) text encoder + flow
    @jax.jit
    def encflow(params, phone, pitch, lengths, zp):
        m_p, logs_p, x_mask = text_encoder(params["enc_p"], phone, pitch, lengths, cfg)
        g = embedding(params["emb_g"], sid)[:, :, None]
        z_p = (m_p + jnp.exp(logs_p) * zp * 0.66666) * x_mask
        z = flow_reverse(params["flow"], z_p, x_mask, g, cfg)
        return z * x_mask, g

    t = timeit(encflow, params, phone, pitch, lengths, zp_noise)
    ca = encflow.lower(params, phone, pitch, lengths, zp_noise).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    print(
        f"enc_p + flow: {t*1e3:.1f}ms  xla_bytes={ca.get('bytes accessed', 0)/1e9:.1f}G "
        f"({ca.get('bytes accessed', 0)/t/1e9:.0f} GB/s)  flops={ca.get('flops', 0)/1e9:.0f}G",
        flush=True,
    )
    z, g = encflow(params, phone, pitch, lengths, zp_noise)

    # encoder alone vs flow alone
    @jax.jit
    def enc_only(params, phone, pitch, lengths):
        return text_encoder(params["enc_p"], phone, pitch, lengths, cfg)

    t = timeit(enc_only, params, phone, pitch, lengths)
    print(f"enc_p only: {t*1e3:.1f}ms", flush=True)

    @jax.jit
    def flow_only(params, z, lengths):
        x_mask = (jnp.arange(z.shape[-1])[None, None, :] < lengths[:, None, None]).astype(z.dtype)
        g2 = embedding(params["emb_g"], sid)[:, :, None]
        return flow_reverse(params["flow"], z * x_mask, x_mask, g2, cfg)

    t = timeit(flow_only, params, z, lengths)
    print(f"flow only: {t*1e3:.1f}ms", flush=True)

    # 3) windowed NSF decoder
    @jax.jit
    def dec(params, z, nsff0, g, sine):
        return generator_nsf_windowed(params["dec"], z, nsff0, g, cfg,
                                      noise=sine, window_frames=256)

    t = timeit(dec, params, z, nsff0, g, sine_noise)
    print(f"nsf decoder (windowed): {t*1e3:.1f}ms", flush=True)

    # 4) full stage for reference
    from aicovergen_tpu.models.rvc import synthesizer_infer

    @jax.jit
    def full(params, phone, lengths, pitch, nsff0, sid, zp, sine):
        return synthesizer_infer(params, cfg, phone, lengths, pitch, nsff0, sid,
                                 zp_noise=zp, sine_noise=sine, dec_window_frames=256)

    t = timeit(full, params, phone, lengths, pitch, nsff0, sid, zp_noise, sine_noise)
    print(f"full synthesizer_infer: {t*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
