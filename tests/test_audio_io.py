"""Output-encoding contract of io.audio.save_audio.

The reference always encodes to the requested format via pydub/ffmpeg and
errors when ffmpeg is missing (src/main.py:229-233); we match that and add an
explicit opt-in WAV downgrade for dependency-free sandboxes.
"""

import os

import numpy as np
import pytest

from aicovergen_tpu.io import audio as audio_io


@pytest.fixture
def mix():
    rng = np.random.default_rng(3)
    return (rng.standard_normal((2, 1024)) * 8000).astype(np.int16)


def test_save_wav_native(tmp_path, mix):
    path = str(tmp_path / "out.wav")
    got = audio_io.save_audio(path, mix, 44100, "wav")
    assert got == path and os.path.exists(path)
    back, sr = audio_io.read_wav(path)
    assert sr == 44100 and back.shape == (2, 1024)


def test_mp3_without_ffmpeg_is_an_error(tmp_path, mix, monkeypatch):
    monkeypatch.setattr(audio_io, "have_ffmpeg", lambda: False)
    monkeypatch.delenv("AICG_OUTPUT_FALLBACK", raising=False)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        audio_io.save_audio(str(tmp_path / "out.mp3"), mix, 44100, "mp3")
    assert not list(tmp_path.iterdir())  # nothing written under any name


def test_mp3_fallback_opt_in_writes_renamed_wav(tmp_path, mix, monkeypatch):
    monkeypatch.setattr(audio_io, "have_ffmpeg", lambda: False)
    monkeypatch.setenv("AICG_OUTPUT_FALLBACK", "wav")
    got = audio_io.save_audio(str(tmp_path / "out.mp3"), mix, 44100, "mp3")
    assert got.endswith("out.wav") and os.path.exists(got)
