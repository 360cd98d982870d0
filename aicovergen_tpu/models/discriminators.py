"""HiFi-GAN discriminators (multi-period + multi-scale) in functional JAX.

Port of MultiPeriodDiscriminator[V2] / DiscriminatorS / DiscriminatorP
(reference src/infer_pack/models.py:958-1124).  The reference ships these as
training-only components (never called at inference); here they power the
distributed training step in parallel/train.py.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import LRELU_SLOPE, conv1d, conv2d, leaky_relu

PERIODS_V1 = (2, 3, 5, 7, 11, 17)
PERIODS_V2 = (2, 3, 5, 7, 11, 17, 23, 37)

# DiscriminatorS conv specs: (out, k, stride, groups, pad)
_DS_SPECS = (
    (16, 15, 1, 1, 7),
    (64, 41, 4, 4, 20),
    (256, 41, 4, 16, 20),
    (1024, 41, 4, 64, 20),
    (1024, 41, 4, 256, 20),
    (1024, 5, 1, 1, 2),
)


def discriminator_s(p, x: jnp.ndarray):
    """x: (B, 1, T) -> (logits, feature maps)."""
    fmap = []
    for i, (_out, _k, stride, groups, pad) in enumerate(_DS_SPECS):
        x = conv1d(p["convs"][str(i)], x, stride=stride, padding=pad, groups=groups)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = conv1d(p["conv_post"], x, padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def discriminator_p(p, x: jnp.ndarray, period: int, kernel_size: int = 5, stride: int = 3):
    """x: (B, 1, T) -> (logits, feature maps); folds time into (T//period, period)."""
    b, c, t = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = x.reshape(b, c, t // period, period)
    fmap = []
    pad = (kernel_size - 1) // 2
    for i in range(4):
        x = conv2d(p["convs"][str(i)], x, stride=(stride, 1), padding=(pad, 0))
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = conv2d(p["convs"]["4"], x, padding=(pad, 0))
    x = leaky_relu(x, LRELU_SLOPE)
    fmap.append(x)
    x = conv2d(p["conv_post"], x, padding=(1, 0))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def multi_period_discriminator(p, y: jnp.ndarray, y_hat: jnp.ndarray, version: str = "v2"):
    """Run all sub-discriminators on real/generated audio (B, 1, T).
    Returns (real_logits, gen_logits, real_fmaps, gen_fmaps)."""
    periods = PERIODS_V2 if version == "v2" else PERIODS_V1
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i in range(len(periods) + 1):
        sub = p["discriminators"][str(i)]
        if i == 0:
            r, fr = discriminator_s(sub, y)
            g, fg = discriminator_s(sub, y_hat)
        else:
            r, fr = discriminator_p(sub, y, periods[i - 1])
            g, fg = discriminator_p(sub, y_hat, periods[i - 1])
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# init (training from scratch / dryruns)
# ---------------------------------------------------------------------------


def _conv_init(rng, shape):
    fan_in = int(np.prod(shape[1:]))
    return (rng.standard_normal(shape) * (1.0 / np.sqrt(fan_in))).astype(np.float32)


def init_mpd_params(version: str = "v2", seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    periods = PERIODS_V2 if version == "v2" else PERIODS_V1
    discs = {}
    # DiscriminatorS
    convs = {}
    c_in = 1
    for i, (out, k, _s, groups, _p) in enumerate(_DS_SPECS):
        convs[str(i)] = {
            "weight": _conv_init(rng, (out, c_in // groups, k)),
            "bias": np.zeros(out, np.float32),
        }
        c_in = out
    discs["0"] = {
        "convs": convs,
        "conv_post": {"weight": _conv_init(rng, (1, 1024, 3)), "bias": np.zeros(1, np.float32)},
    }
    # DiscriminatorP per period
    for pi in range(len(periods)):
        convs = {}
        chans = [1, 32, 128, 512, 1024, 1024]
        for i in range(5):
            k = 5 if i < 5 else 3
            convs[str(i)] = {
                "weight": _conv_init(rng, (chans[i + 1], chans[i], 5, 1)),
                "bias": np.zeros(chans[i + 1], np.float32),
            }
        discs[str(pi + 1)] = {
            "convs": convs,
            "conv_post": {
                "weight": _conv_init(rng, (1, 1024, 3, 1)),
                "bias": np.zeros(1, np.float32),
            },
        }
    return {"discriminators": discs}
