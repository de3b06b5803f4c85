"""WAV decoding without torchaudio/soundfile.

The reference decodes with ``torchaudio.load`` (sox/ffmpeg native code,
SURVEY.md §2.5).  Here decoding stays on the host: a stdlib-``wave`` +
numpy PCM decoder, with an optional C++ fast path (``native/``) loaded via
ctypes when built (see ``tpat_tpu.data.native``).

Output matches torchaudio.load semantics: float32 in [-1, 1], shape
(channels, num_samples).
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode a PCM WAV file -> (waveform (C, N) float32 in [-1,1], sr)."""
    try:
        from tpat_tpu.data import native

        if native.available():
            return native.load_wav(path)
    except Exception:
        pass  # unsupported format or decode error -> python fallback
    return load_wav_python(path)


def load_wav_python(path: str) -> Tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:  # unsigned 8-bit
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:  # 24-bit packed
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        val = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    return data.reshape(-1, ch).T.copy(), sr


def save_wav(path: str, waveform: np.ndarray, sr: int):
    """Write float32 [-1,1] (C, N) or (N,) as 16-bit PCM (test fixtures)."""
    w = np.asarray(waveform, dtype=np.float32)
    if w.ndim == 1:
        w = w[None]
    pcm = np.clip(w.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(w.shape[0])
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
