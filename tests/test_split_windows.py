"""The windowed device split-point search must reproduce find_split_points.

find_split_points is the behavioral port of the reference's minimum-energy
split search (reference src/vc_infer_pipeline.py:516-528); the windowed path
(`_split_windows_pack` + `_split_points_from_windows`) fetches only the
±x_query windows around each center instead of the whole track, so this
pins the two paths to each other across lengths (no split / one / many
centers, tail-clamped last window) and center placements.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from aicovergen_tpu.pipeline.vc import (
    SR,
    _n_split_centers,
    _split_points_from_windows,
    _split_windows_pack,
    find_split_points,
)
from aicovergen_tpu.pipeline.f0 import WINDOW
from aicovergen_tpu.utils.config import RuntimeConfig


# small windows so the test runs in seconds: centers every 2 s, ±0.5 s query
CFG = RuntimeConfig(x_pad=1, x_query=1, x_center=4, x_max=5)


def _windowed_split(audio: np.ndarray, cfg: RuntimeConfig, bucket_s: int = 8):
    n_true = audio.shape[0]
    n_c = _n_split_centers(n_true, cfg)
    if n_c == 0:
        return []
    hpf_b = jnp.asarray(
        np.pad(audio.astype(np.float32), (0, (-n_true) % (SR * bucket_s)))
    )
    flat = np.asarray(
        _split_windows_pack(hpf_b, None, n_c, SR * cfg.x_center, SR * cfg.x_query)
    )
    wlen = 2 * SR * cfg.x_query + WINDOW
    return _split_points_from_windows(flat.reshape(n_c, wlen), n_true, cfg)


@pytest.mark.parametrize(
    "seconds",
    [
        3.0,  # below x_max: no split at all
        6.0,  # one center
        14.3,  # multiple centers, last window clamped at the tail
        16.0,  # n_true an exact multiple of t_center (t == n edge)
        12.0 + 1.0 / SR,  # center exactly at a window boundary
    ],
)
def test_windowed_matches_full(seconds):
    rng = np.random.default_rng(int(seconds * 100))
    n = int(seconds * SR)
    # mix of tones and quiet gaps so minima are non-trivial
    t = np.arange(n) / SR
    audio = 0.3 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 0.3 * t) > -0.4)
    audio = (audio + 0.01 * rng.standard_normal(n)).astype(np.float32)

    full = find_split_points(audio.astype(np.float64), CFG)
    windowed = _windowed_split(audio, CFG)
    assert windowed == full


def test_center_count_matches_reference_loop():
    for seconds in (3, 5, 6, 12, 12.5, 24, 63.99):
        n = int(seconds * SR)
        expect = (
            0
            if n + WINDOW <= SR * CFG.x_max
            else len(range(SR * CFG.x_center, n, SR * CFG.x_center))
        )
        assert _n_split_centers(n, CFG) == expect, seconds
