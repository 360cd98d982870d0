"""Host audio I/O boundary.

The reference reached audio through ffmpeg/librosa/soundfile/pydub
(reference src/my_utils.py:5-21, src/main.py:125-135, 229-233).  Here the
policy is: decode/encode happen once at the host boundary, everything in
between stays in device memory.  WAV is handled natively (pure numpy, no
external deps); other containers fall back to ffmpeg when present.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
from typing import Optional, Tuple

import numpy as np

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file -> (float32 array shaped (channels, samples), sr).

    Supports PCM 8/16/24/32-bit and IEEE float 32/64, plus the EXTENSIBLE
    wrapper — the formats produced by soundfile/scipy/pedalboard in the
    reference pipeline.
    """
    with open(path, "rb") as f:
        riff, _size, wave_id = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave_id != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            chunk_id, chunk_size = struct.unpack("<4sI", header)
            if chunk_id == b"fmt ":
                fmt = f.read(chunk_size)
            elif chunk_id == b"data":
                data = f.read(chunk_size)
            else:
                f.seek(chunk_size + (chunk_size & 1), 1)
                continue
            if chunk_size & 1:
                f.seek(1, 1)
            if fmt is not None and data is not None:
                break
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")

    audio_format, n_channels, sr, _byte_rate, _block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        # sub-format GUID: first 2 bytes are the real format code
        audio_format = struct.unpack("<H", fmt[24:26])[0]

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        dtype = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dtype).astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported WAVE format 0x{audio_format:04x}")

    n = (len(x) // n_channels) * n_channels
    return x[:n].reshape(-1, n_channels).T.copy(), sr


def write_wav(
    path: str, audio: np.ndarray, sr: int, subtype: str = "PCM_16",
    atomic: bool = False,
) -> None:
    """Write (channels, samples) or (samples,) float/int16 audio to WAV.

    `atomic=True` writes to a same-directory temp file and os.replace()s it
    into place, so a concurrent reader (the stem-cache existence check of
    another cover of the same song) either sees a COMPLETE file or none —
    never a truncated header/payload."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None, :]
    interleaved = audio.T  # (samples, channels)
    n_channels = interleaved.shape[1]

    if subtype == "PCM_16":
        if interleaved.dtype == np.int16:
            payload = interleaved
        else:
            payload = np.clip(np.round(interleaved * 32767.0), -32768, 32767).astype("<i2")
        bits, fmt_code = 16, _WAVE_FORMAT_PCM
    elif subtype == "FLOAT":
        payload = interleaved.astype("<f4")
        bits, fmt_code = 32, _WAVE_FORMAT_IEEE_FLOAT
    else:
        raise ValueError(f"unsupported subtype {subtype}")

    raw = payload.tobytes()
    byte_rate = sr * n_channels * bits // 8
    block_align = n_channels * bits // 8

    def emit(f):
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + len(raw), b"WAVE"))
        f.write(
            struct.pack(
                "<4sIHHIIHH", b"fmt ", 16, fmt_code, n_channels, sr, byte_rate, block_align, bits
            )
        )
        f.write(struct.pack("<4sI", b"data", len(raw)))
        f.write(raw)

    if not atomic:
        with open(path, "wb") as f:
            emit(f)
        return
    # unique temp per writer: two concurrent writers of the same final path
    # (e.g. one song submitted to two serving workers under sync caching)
    # must never share a temp file, or os.replace can publish an interleaved
    # WAV — exactly the hazard atomic= is advertised to exclude
    import tempfile

    fd, target = tempfile.mkstemp(
        dir=os.path.dirname(path) or ".",
        prefix=os.path.basename(path) + ".",
        suffix=".tmp~",
    )
    try:
        # mkstemp creates 0600 and os.replace preserves it; published cache
        # files must keep the umask-derived mode a plain open() would give
        # (other uids may serve/consume the output dir)
        um = os.umask(0)
        os.umask(um)
        os.fchmod(fd, 0o666 & ~um)
        with os.fdopen(fd, "wb") as f:
            emit(f)
        os.replace(target, path)
    except BaseException:
        try:
            os.unlink(target)
        except OSError:
            pass
        raise


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def ffmpeg_decode(path: str, sr: int, mono: bool) -> Tuple[np.ndarray, int]:
    """Decode any container to float32 PCM via ffmpeg (reference src/my_utils.py:5-21)."""
    cmd = [
        "ffmpeg", "-nostdin", "-loglevel", "error", "-i", path,
        "-f", "f32le", "-acodec", "pcm_f32le",
    ]
    if mono:
        cmd += ["-ac", "1"]
    if sr:
        cmd += ["-ar", str(sr)]
    cmd += ["-"]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    x = np.frombuffer(out, dtype=np.float32)
    if mono:
        return x[None, :].copy(), sr
    # probe channel count
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "a:0", "-show_entries",
         "stream=channels", "-of", "csv=p=0", path],
        capture_output=True, text=True,
    )
    ch = int(probe.stdout.strip() or 1)
    n = (len(x) // ch) * ch
    return x[:n].reshape(-1, ch).T.copy(), sr


def load_audio(path: str, sr: Optional[int] = None, mono: bool = False) -> Tuple[np.ndarray, int]:
    """Load audio as float32 (channels, samples); resample on-host if sr given.

    WAV goes through the native reader; anything else needs ffmpeg.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".wav", ".wave"):
        x, file_sr = read_wav(path)
    elif have_ffmpeg():
        return ffmpeg_decode(path, sr or 0, mono)
    else:
        raise RuntimeError(
            f"cannot decode {path}: not a WAV file and ffmpeg is unavailable"
        )
    if mono and x.shape[0] > 1:
        x = x.mean(axis=0, keepdims=True)
    if sr is not None and sr != file_sr:
        from ..ops.resample import resample_poly_np

        x = resample_poly_np(x, file_sr, sr)
        file_sr = sr
    return x, file_sr


def check_encodable(output_format: str) -> bool:
    """True if `output_format` can be produced here; raises if it can't and
    the WAV-downgrade escape hatch is off.  Call it before expensive compute:
    the precondition is knowable at t=0 (pipeline entry), not only at the
    final save_audio."""
    if output_format == "wav" or have_ffmpeg():
        return True
    if os.environ.get("AICG_OUTPUT_FALLBACK") == "wav":
        return False
    raise RuntimeError(
        f"cannot encode {output_format!r}: ffmpeg is not installed. "
        "Install ffmpeg, pass output_format='wav', or set "
        "AICG_OUTPUT_FALLBACK=wav to accept a WAV downgrade."
    )


def save_audio(path: str, audio: np.ndarray, sr: int, output_format: str = "wav") -> str:
    """Encode the final mix.  WAV natively; anything else via ffmpeg.

    Contract matches the reference (src/main.py:229-233, pydub.export): a
    non-WAV format without ffmpeg is an error — the user asked for mp3 and
    must not silently receive a mislabeled or differently-named file.
    ``AICG_OUTPUT_FALLBACK=wav`` opts in to a WAV downgrade (renamed .wav,
    loudly logged) for zero-dependency sandboxes like the bench harness."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None, :]
    return save_audio_stream(
        path, [audio], audio.shape[0], audio.shape[-1], sr, output_format
    )


def save_audio_stream(
    path: str,
    chunks,
    n_channels: int,
    n_samples: int,
    sr: int,
    output_format: str = "wav",
) -> str:
    """Encode from a (channels, samples)-chunk iterator — the streaming form
    of save_audio.  The pipeline feeds this device-fetched int16 chunks so
    the TPU->host transfer of chunk k+1 overlaps the encode of chunk k, and
    non-WAV formats pipe raw PCM straight into ffmpeg's stdin (no temp-WAV
    disk round-trip — measured ~0.3 s of the 0.84 s encode stage on a 120 s
    mix).  `n_samples` is the true mix length: the total written is trimmed
    there (chunk iterators may carry length-class padding past it)."""
    if not check_encodable(output_format):
        path = os.path.splitext(path)[0] + ".wav"
        print(f"[!] ffmpeg unavailable — writing WAV instead: {path}")
        output_format = "wav"

    def pcm16(iterable):
        done = 0
        for chunk in iterable:
            chunk = np.asarray(chunk)
            if chunk.ndim == 1:
                chunk = chunk[None, :]
            take = min(chunk.shape[-1], n_samples - done)
            if take <= 0:
                break
            chunk = chunk[:, :take]
            done += take
            if chunk.dtype != np.int16:
                chunk = np.clip(np.round(chunk * 32767.0), -32768, 32767)
            yield np.ascontiguousarray(chunk.T.astype("<i2"))  # interleaved

    if output_format == "wav":
        raw_len = n_samples * n_channels * 2
        byte_rate = sr * n_channels * 2
        with open(path, "wb") as f:
            f.write(struct.pack("<4sI4s", b"RIFF", 36 + raw_len, b"WAVE"))
            f.write(struct.pack("<4sIHHIIHH", b"fmt ", 16, _WAVE_FORMAT_PCM,
                                n_channels, sr, byte_rate, n_channels * 2, 16))
            f.write(struct.pack("<4sI", b"data", raw_len))
            written = 0
            for part in pcm16(chunks):
                f.write(part.tobytes())
                written += part.shape[0]
            if written < n_samples:  # honor the declared header length
                f.write(b"\x00" * ((n_samples - written) * n_channels * 2))
        return path

    proc = subprocess.Popen(
        ["ffmpeg", "-y", "-loglevel", "error",
         "-f", "s16le", "-ar", str(sr), "-ac", str(n_channels), "-i", "-",
         path],
        stdin=subprocess.PIPE,
    )
    try:
        for part in pcm16(chunks):
            proc.stdin.write(part.tobytes())
    finally:
        proc.stdin.close()
        rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"ffmpeg encode of {path} failed (rc={rc})")
    return path


def to_stereo(audio: np.ndarray) -> np.ndarray:
    """(channels, samples) -> (2, samples) (reference src/main.py:125-135)."""
    if audio.ndim == 1:
        audio = audio[None, :]
    if audio.shape[0] == 1:
        return np.repeat(audio, 2, axis=0)
    return audio[:2]


def to_mono(audio: np.ndarray) -> np.ndarray:
    if audio.ndim == 1:
        return audio
    return audio.mean(axis=0)
