"""ctypes binding to the native C++ audio frontend (``native/``).

Provides fast WAV decode + Kaldi fbank on the host, replacing the
reference's torchaudio C++ kernels (SURVEY.md §2.5).  Falls back cleanly
when the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
# must match tpat_abi_version() in native/csrc/tpat_audio.cpp
_ABI_VERSION = 2

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libtpat_audio.so"),
    os.path.join(os.path.dirname(__file__), "libtpat_audio.so"),
]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TPAT_DISABLE_NATIVE") == "1":
        return None
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            # ABI guard: calling a stale .so with a changed signature
            # would pass ints where it expects pointers (segfault inside
            # the data loader) — refuse anything but an exact version
            # match and fall back to the numpy path.
            try:
                ver = int(lib.tpat_abi_version())
            except AttributeError:
                ver = 1
            if ver != _ABI_VERSION:
                import warnings

                warnings.warn(
                    f"{p} has native ABI v{ver}, this build needs "
                    f"v{_ABI_VERSION}; rebuild with `make -C native` "
                    "(falling back to the numpy frontend)"
                )
                continue
            lib.tpat_load_wav.restype = ctypes.c_int
            lib.tpat_load_wav.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.tpat_fbank.restype = ctypes.c_int
            lib.tpat_fbank.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # waveform
                ctypes.c_int64,  # num samples
                ctypes.c_int32,  # sample rate
                ctypes.c_int32,  # num mel bins
                ctypes.c_int32,  # window type (0 hanning, 1 povey)
                ctypes.POINTER(ctypes.c_float),  # out (frames x bins)
                ctypes.POINTER(ctypes.c_int64),  # out frames
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


_MAX_SAMPLES = 16000 * 60 * 10  # 10 minutes at 16 kHz


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    assert lib is not None
    buf = np.empty(_MAX_SAMPLES, dtype=np.float32)
    n = ctypes.c_int64(buf.size)
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    rc = lib.tpat_load_wav(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(n),
        ctypes.byref(sr),
        ctypes.byref(ch),
        buf.size,
    )
    if rc != 0:
        raise IOError(f"native wav decode failed ({rc}) for {path}")
    # C++ writes deinterleaved: channel c occupies out[c*n : (c+1)*n).
    data = buf[: n.value * ch.value].copy()
    return data.reshape(ch.value, n.value), sr.value


_WINDOWS = {"hanning": 0, "povey": 1}


def fbank(
    waveform: np.ndarray,
    sample_rate: int,
    num_mel_bins: int = 128,
    window_type: str = "hanning",
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    wav = np.ascontiguousarray(waveform.reshape(-1), dtype=np.float32)
    max_frames = 1 + len(wav) // (sample_rate // 100)
    out = np.empty((max_frames, num_mel_bins), dtype=np.float32)
    nframes = ctypes.c_int64(0)
    rc = lib.tpat_fbank(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(wav),
        sample_rate,
        num_mel_bins,
        _WINDOWS[window_type],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(nframes),
    )
    if rc != 0:
        raise RuntimeError(f"native fbank failed ({rc})")
    return out[: nframes.value].copy()
