"""Trainset preparation + feature extraction.

Behavioral equivalent of the reference's (dead) preprocessor contract
(reference src/trainset_preprocess_pipeline_print.py:36-134):

  * 5th-order Butterworth 48 Hz high-pass (lfilter, not filtfilt — the
    upstream comment notes zero-phase pre-ringing, :84-86);
  * silence-based slicing (upstream RVC `slicer2` semantics: RMS threshold
    -42 dB, min length 1.5 s, min interval 0.4 s, hop 15 ms, keep <=0.5 s of
    silence around cuts);
  * 3.0 s windows with 0.3 s overlap per slice (:50-52, 90-101);
  * peak*0.9*alpha + (1-alpha)*raw normalization, alpha 0.75, clips with
    |peak| > 2.5 dropped (:60-80);
  * dual-rate output: native sr (`0_gt_wavs`) + 16 kHz (`1_16k_wavs`).

On top of that (which the reference never had working): `extract_features`
turns prepared clips into RVC training tensors — HuBERT phone features,
RMVPE (or autocorrelation) f0 at 100 Hz, linear spectrogram at the
synthesizer hop, aligned waveform — and `make_batches` assembles the static
-shape batch dicts consumed by parallel.train.make_train_step.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from ..ops.resample import resample_poly_np


# --------------------------------------------------------------------- slicer


@dataclass
class Slicer:
    """RMS silence slicer (upstream RVC `slicer2.Slicer` parameter semantics;
    written from the documented behavior, all times in ms)."""

    sr: int
    threshold: float = -42.0  # dB below which a frame counts as silence
    min_length: int = 1500  # minimum output clip length
    min_interval: int = 400  # minimum silence run that can split
    hop_size: int = 15  # RMS frame hop
    max_sil_kept: int = 500  # silence kept on each side of a cut

    def _rms_frames(self, audio: np.ndarray) -> np.ndarray:
        hop = max(int(self.sr * self.hop_size / 1000), 1)
        win = 2 * hop
        n = max(1 + (len(audio) - win) // hop, 1)
        idx = np.arange(win)[None, :] + hop * np.arange(n)[:, None]
        idx = np.minimum(idx, len(audio) - 1)
        frames = audio[idx]
        return np.sqrt(np.mean(np.square(frames), axis=1) + 1e-12)

    def slice(self, audio: np.ndarray) -> List[np.ndarray]:
        if len(audio) / self.sr * 1000 < self.min_length * 2:
            return [audio]
        hop = max(int(self.sr * self.hop_size / 1000), 1)
        rms_db = 20 * np.log10(self._rms_frames(audio))
        silent = rms_db < self.threshold

        min_interval_f = max(int(self.min_interval / self.hop_size), 1)
        min_length_f = max(int(self.min_length / self.hop_size), 1)
        max_sil_f = max(int(self.max_sil_kept / self.hop_size), 1)

        # contiguous silence runs long enough to split on
        cuts = []  # frame indices to cut at
        run_start = None
        for i, s in enumerate(np.append(silent, False)):
            if s and run_start is None:
                run_start = i
            elif not s and run_start is not None:
                if i - run_start >= min_interval_f:
                    seg = rms_db[run_start:i]
                    cut = run_start + int(np.argmin(seg))
                    lo = max(cut - max_sil_f, run_start)
                    hi = min(cut + max_sil_f, i)
                    cuts.append((lo, cut, hi))
                run_start = None

        if not cuts:
            return [audio]
        clips = []
        prev_end = 0
        for lo, cut, hi in cuts:
            clip = audio[prev_end * hop : min(hi * hop, len(audio))]
            if len(clip) >= min_length_f * hop:
                clips.append(clip)
                prev_end = lo
            # else: run too close to the previous cut — keep accumulating
        tail = audio[prev_end * hop :]
        if len(tail) >= min_length_f * hop:
            clips.append(tail)
        elif clips:
            clips[-1] = audio[len(audio) - len(clips[-1]) - len(tail) :]
        return clips or [audio]


# ---------------------------------------------------------------- preprocess


def _highpass_48(audio: np.ndarray, sr: int) -> np.ndarray:
    import jax.numpy as jnp

    from ..ops.filters import butter_highpass, lfilter

    b, a = butter_highpass(5, 48, sr)
    return np.asarray(lfilter(b, a, jnp.asarray(audio)))


def preprocess_trainset(
    inp_root: str,
    sr: int,
    exp_dir: str,
    per: float = 3.0,
    overlap: float = 0.3,
    peak: float = 0.9,
    alpha: float = 0.75,
) -> int:
    """Directory of raw recordings -> exp_dir/0_gt_wavs (+ 1_16k_wavs).
    Returns the number of clips written."""
    from ..io.audio import load_audio, write_wav

    gt_dir = os.path.join(exp_dir, "0_gt_wavs")
    k16_dir = os.path.join(exp_dir, "1_16k_wavs")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(k16_dir, exist_ok=True)
    slicer = Slicer(sr=sr)
    tail = per + overlap
    written = 0

    def norm_write(clip, idx0, idx1):
        nonlocal written
        m = np.abs(clip).max() if len(clip) else 0.0
        if m == 0.0 or m > 2.5:  # degenerate / clipped beyond repair (:62-64)
            return
        out = clip / m * (peak * alpha) + (1 - alpha) * clip
        write_wav(os.path.join(gt_dir, f"{idx0}_{idx1}.wav"), out.astype(np.float32), sr,
                  subtype="FLOAT")
        out16 = resample_poly_np(out.astype(np.float32), sr, 16000)
        write_wav(os.path.join(k16_dir, f"{idx0}_{idx1}.wav"), out16.astype(np.float32),
                  16000, subtype="FLOAT")
        written += 1

    for idx0, name in enumerate(sorted(os.listdir(inp_root))):
        path = os.path.join(inp_root, name)
        try:
            audio, file_sr = load_audio(path, sr=sr, mono=True)
        except Exception as e:
            print(f"[preprocess] {path}: {e}")
            continue
        audio = _highpass_48(np.asarray(audio, np.float64).reshape(-1), sr)
        idx1 = 0
        for clip in slicer.slice(audio):
            i = 0
            while True:
                start = int(sr * (per - overlap) * i)
                i += 1
                if len(clip[start:]) > tail * sr:
                    norm_write(clip[start : start + int(per * sr)], idx0, idx1)
                    idx1 += 1
                else:
                    norm_write(clip[start:], idx0, idx1)
                    idx1 += 1
                    break
    return written


# ------------------------------------------------------------------ features


def extract_features(
    exp_dir: str,
    hubert_params: dict,
    cfg,
    f0_estimator=None,
    f0_method: str = "rmvpe",
    version: str = "v2",
    limit: Optional[int] = None,
) -> List[dict]:
    """Prepared clips -> per-clip training tensors.

    Alignment contract (upstream RVC): spec hop at the native rate equals
    10 ms (hop = sr//100), HuBERT's 50 Hz features are repeated x2 to
    100 Hz, f0 is computed on the 16 kHz copy at 100 Hz; everything crops
    to the common frame count and wav crops to frames*upp samples.
    """
    import jax.numpy as jnp

    from ..io.audio import read_wav
    from ..models.hubert import hubert_features
    from ..ops.stft import hann_window, stft
    from ..pipeline.f0 import WINDOW

    sr = cfg.sr
    hop = sr // 100
    n_fft = (cfg.spec_channels - 1) * 2
    window = hann_window(n_fft)
    upp = cfg.upp

    gt_dir = os.path.join(exp_dir, "0_gt_wavs")
    k16_dir = os.path.join(exp_dir, "1_16k_wavs")
    names = sorted(os.listdir(gt_dir))
    if limit:
        names = names[:limit]
    samples = []
    for name in names:
        wav, _ = read_wav(os.path.join(gt_dir, name))
        wav = np.asarray(wav, np.float32).reshape(-1)
        wav16, _ = read_wav(os.path.join(k16_dir, name))
        wav16 = np.asarray(wav16, np.float32).reshape(-1)

        feats = np.asarray(
            hubert_features(hubert_params, jnp.asarray(wav16)[None], version=version)[0],
            np.float32,
        )
        phone = np.repeat(feats, 2, axis=0)  # 50 Hz -> 100 Hz

        spec = np.abs(
            np.asarray(stft(jnp.asarray(wav)[None], n_fft, hop, window, center=True)[0])
        ).astype(np.float32)

        if f0_estimator is not None:
            from ..pipeline.f0 import coarse_f0

            p_len16 = len(wav16) // WINDOW
            f0 = f0_estimator.compute(wav16.astype(np.float64), p_len16, f0_method)
            pitchf = f0.astype(np.float32)  # WINDOW-hop (10 ms) frames at 16 kHz
            pitch = coarse_f0(f0.copy())
        else:
            pitchf = np.zeros(len(wav16) // WINDOW, np.float32)
            pitch = np.ones(len(wav16) // WINDOW, dtype=np.int64)

        frames = min(phone.shape[0], spec.shape[1], len(pitch), len(wav) // upp)
        samples.append(
            {
                "phone": phone[:frames],
                "pitch": np.asarray(pitch[:frames], np.int64),
                "pitchf": pitchf[:frames],
                "spec": spec[:, :frames],
                "wav": wav[: frames * upp],
                "frames": frames,
                "name": name,
            }
        )
    return samples


def make_batches(
    samples: List[dict],
    batch_size: int,
    frames: int,
    sid: int = 0,
    seed: int = 0,
    drop_short: bool = False,
) -> Iterator[dict]:
    """Static-shape batch dicts for make_train_step: each sample is cropped
    (random offset) or zero-padded to `frames`; lengths carries the true
    frame counts so masks stay exact."""
    rng = np.random.default_rng(seed)
    usable = [s for s in samples if (s["frames"] >= frames or not drop_short)]
    if not usable:
        return
    order = rng.permutation(len(usable))
    emb_dim = usable[0]["phone"].shape[1]
    spec_ch = usable[0]["spec"].shape[0]
    upp = usable[0]["wav"].shape[0] // max(usable[0]["frames"], 1)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idxs = order[i : i + batch_size]
        batch = {
            "phone": np.zeros((batch_size, frames, emb_dim), np.float32),
            "pitch": np.ones((batch_size, frames), np.int64),
            "pitchf": np.zeros((batch_size, frames), np.float32),
            "spec": np.zeros((batch_size, spec_ch, frames), np.float32),
            "wav": np.zeros((batch_size, frames * upp), np.float32),
            "lengths": np.zeros((batch_size,), np.int64),
            "sid": np.full((batch_size,), sid, np.int64),
        }
        for row, j in enumerate(idxs):
            s = usable[j]
            n = min(s["frames"], frames)
            off = rng.integers(0, s["frames"] - n + 1)
            batch["phone"][row, :n] = s["phone"][off : off + n]
            batch["pitch"][row, :n] = s["pitch"][off : off + n]
            batch["pitchf"][row, :n] = s["pitchf"][off : off + n]
            batch["spec"][row, :, :n] = s["spec"][:, off : off + n]
            batch["wav"][row, : n * upp] = s["wav"][off * upp : (off + n) * upp]
            batch["lengths"][row] = n
        yield batch
