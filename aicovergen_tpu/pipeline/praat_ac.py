"""Praat-style autocorrelation pitch ("pm"), from Boersma's published
algorithm.

The reference's `pm` method is parselmouth `Sound.to_pitch_ac(time_step=
0.01, voicing_threshold=0.6, pitch_floor=50, pitch_ceiling=1100)`
(reference src/vc_infer_pipeline.py:200-215).  parselmouth is a Praat
binding; its AC method is Boersma (1993), "Accurate short-term analysis of
the fundamental frequency and the harmonics-to-noise ratio of a sampled
sound", IFA Proceedings 17: 97-110.  This module implements that paper's
pipeline — window-compensated normalized autocorrelation, multi-candidate
extraction with octave-cost weighting, a silence/voicing unvoiced
candidate, and Viterbi path finding with octave-jump / voicing-transition
costs — rather than a generic per-frame argmax tracker:

  1. per frame (Hanning window of 3/pitch_floor seconds, hop = time_step):
     subtract the local mean, window, and compute the normalized
     autocorrelation r_x(tau) via FFT; divide by the window's own
     normalized autocorrelation r_w(tau) (the paper's eq. 9: the sampled
     autocorrelation of a windowed signal is the true autocorrelation
     times r_w, so dividing undoes the window taper bias);
  2. voiced candidates = local maxima of r(tau) on tau in
     (1/pitch_ceiling, window/2), parabolically interpolated, with
     candidate strength  R = r(tau) - octave_cost * log2(pitch_floor*tau)
     (paper eq. 24: the octave cost breaks ties toward higher octaves,
     countering the ACF's octave-down bias); top `max_candidates - 1` kept;
  3. the unvoiced candidate strength (paper eq. 23):
     R = voicing_threshold
         + max(0, 2 - (localPeak/globalPeak) / (silence_threshold /
                                                 (1 + voicing_threshold)))
  4. Viterbi over frames x candidates (paper eq. 25): transition cost 0
     between unvoiced states, `voiced_unvoiced_cost` across a voicing
     change, and `octave_jump_cost * |log2(f1/f2)|` between voiced states.

Defaults below are Praat's documented `To Pitch (ac)...` defaults
(silence_threshold 0.03, octave_cost 0.01, octave_jump_cost 0.35,
voiced_unvoiced_cost 0.14, max_candidates 15); the reference overrides
voicing_threshold to 0.6.  Praat's sinc-interpolated peak refinement is
approximated by parabolic interpolation on r (the lag grid at 16 kHz is
dense relative to the 50-1100 Hz search band, so the difference is
sub-cent); exact parselmouth numerics are NOT claimed — the environment
ships no parselmouth to fixture against — but every structural element of
the published algorithm is present, which is the same standard as the
from-the-paper WORLD Harvest (pipeline/harvest.py).

Host numpy implementation: `pm` is a non-default method and the whole
track costs ~0.5 s of host FFTs per 2-minute song; the batched-FFT
structure maps 1:1 onto jnp if it ever needs to move on device.
"""

from __future__ import annotations

import numpy as np

SR = 16000


def _frame_signal(x: np.ndarray, win: int, hop: int):
    """Centered short-term frames (Praat Sampled_shortTermAnalysis): frame
    count floor((n - win)/hop) + 1, with the frame grid centered in the
    signal.  Returns (frames (N, win), first-frame center sample index)."""
    n = x.shape[0]
    n_frames = max(1, int((n - win) // hop) + 1)
    # center the frame grid: first frame center at mid - (n_frames-1)/2*hop
    mid = 0.5 * (n - 1)
    c0 = mid - 0.5 * (n_frames - 1) * hop
    starts = np.rint(c0 - 0.5 * win + np.arange(n_frames) * hop).astype(np.int64)
    starts = np.clip(starts, 0, max(n - win, 0))
    idx = starts[:, None] + np.arange(win)[None, :]
    return x[np.minimum(idx, n - 1)], starts + win // 2


def praat_ac_f0(
    x: np.ndarray,
    p_len: int,
    time_step: float = 0.01,
    voicing_threshold: float = 0.6,
    fmin: float = 50.0,
    fmax: float = 1100.0,
    silence_threshold: float = 0.03,
    octave_cost: float = 0.01,
    octave_jump_cost: float = 0.35,
    voiced_unvoiced_cost: float = 0.14,
    max_candidates: int = 15,
    sr: int = SR,
) -> np.ndarray:
    """f0 track (Hz, 0 = unvoiced) of `x`, padded/trimmed to p_len with the
    reference's symmetric pad (vc_infer_pipeline.py:290-294 contract)."""
    x = np.asarray(x, np.float64)
    x = x - x.mean()
    global_peak = np.max(np.abs(x)) or 1.0

    win = int(round(3.0 / fmin * sr))  # 3 longest periods (paper sect. 2)
    win = min(win | 1, max(3, x.shape[0]))  # odd length, bounded by signal
    hop = max(1, int(round(time_step * sr)))
    frames, _centers = _frame_signal(x, win, hop)
    n_frames = frames.shape[0]

    frames = frames - frames.mean(axis=1, keepdims=True)
    local_peak = np.max(np.abs(frames), axis=1)
    w = np.hanning(win)
    fw = frames * w

    # normalized autocorrelation, window-compensated (paper eqs. 8-9)
    nfft = 1 << int(np.ceil(np.log2(2 * win)))
    spec = np.fft.rfft(fw, nfft, axis=1)
    acf = np.fft.irfft(spec * np.conj(spec), nfft, axis=1)[:, :win]
    r = acf / np.maximum(acf[:, :1], 1e-300)
    wacf = np.fft.irfft(np.abs(np.fft.rfft(w, nfft)) ** 2, nfft)[:win]
    rw = wacf / wacf[0]
    # beyond ~half the window r_w is tiny and the division explodes; the
    # candidate band below never reaches there (tau_max = sr/fmin = win/3)
    r = r / np.maximum(rw[None, :], 1e-6)

    lag_min = max(2, int(np.floor(sr / fmax)))
    lag_max = min(int(np.ceil(sr / fmin)) + 1, win - 2)

    # ---- voiced candidates: local maxima of r in the band, interpolated
    band = r[:, lag_min : lag_max + 1]
    left = r[:, lag_min - 1 : lag_max]
    right = r[:, lag_min + 1 : lag_max + 2]
    is_peak = (band > left) & (band >= right) & (band > 0.0)

    n_voiced = max_candidates - 1
    # top-k peaks per frame by octave-cost-weighted strength (paper eq. 24)
    taus = np.arange(lag_min, lag_max + 1, dtype=np.float64) / sr
    weight = -octave_cost * np.log2(fmin * taus)  # >= 0 bonus for high f
    scored = np.where(is_peak, band + weight[None, :], -np.inf)
    order = np.argsort(-scored, axis=1)[:, :n_voiced]  # (N, n_voiced)
    rowi = np.arange(n_frames)[:, None]
    picked = scored[rowi, order] > -np.inf  # valid candidate mask

    lags0 = order + lag_min
    # parabolic interpolation of each picked maximum on r
    y0 = r[rowi, lags0 - 1]
    y1 = r[rowi, lags0]
    y2 = r[rowi, lags0 + 1]
    denom = y0 - 2 * y1 + y2
    with np.errstate(divide="ignore", invalid="ignore"):
        delta = np.where(np.abs(denom) > 1e-12, 0.5 * (y0 - y2) / denom, 0.0)
    delta = np.clip(np.nan_to_num(delta), -1.0, 1.0)
    lag = lags0 + delta
    r_peak = y1 - 0.25 * (y0 - y2) * delta
    freq = sr / lag
    strength = r_peak - octave_cost * np.log2(fmin * lag / sr)
    in_range = (freq > fmin * 0.99) & (freq < fmax) & picked
    strength = np.where(in_range, strength, -np.inf)
    freq = np.where(in_range, freq, 0.0)

    # ---- unvoiced candidate (paper eq. 23)
    unvoiced = voicing_threshold + np.maximum(
        0.0,
        2.0
        - (local_peak / global_peak)
        / (silence_threshold / (1.0 + voicing_threshold)),
    )

    # candidate tables: column 0 = unvoiced, 1.. = voiced
    cand_f = np.concatenate([np.zeros((n_frames, 1)), freq], axis=1)
    cand_s = np.concatenate([unvoiced[:, None], strength], axis=1)
    n_cand = cand_f.shape[1]

    # ---- Viterbi path (paper eq. 25); costs are per Praat's 0.01 s step
    cost_scale = time_step / 0.01
    vuv_cost = voiced_unvoiced_cost * cost_scale
    jump_cost = octave_jump_cost * cost_scale
    score = cand_s[0].copy()
    back = np.zeros((n_frames, n_cand), np.int64)
    safe_f = np.where(cand_f > 0, cand_f, 1.0)
    for t in range(1, n_frames):
        v_prev = cand_f[t - 1] > 0
        v_cur = cand_f[t] > 0
        trans = np.where(
            v_prev[:, None] != v_cur[None, :],
            vuv_cost,
            np.where(
                v_prev[:, None] & v_cur[None, :],
                jump_cost
                * np.abs(np.log2(safe_f[t - 1][:, None] / safe_f[t][None, :])),
                0.0,
            ),
        )
        total = score[:, None] - trans
        back[t] = np.argmax(total, axis=0)
        score = total[back[t], np.arange(n_cand)] + cand_s[t]

    path = np.zeros(n_frames, np.int64)
    path[-1] = int(np.argmax(score))
    for t in range(n_frames - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    f0 = cand_f[np.arange(n_frames), path]

    if len(f0) == p_len:
        return f0
    if len(f0) > p_len:
        return f0[:p_len]
    pad = (p_len - len(f0) + 1) // 2
    return np.pad(f0, (pad, p_len - len(f0) - pad))
