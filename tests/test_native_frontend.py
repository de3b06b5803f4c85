"""Native C++ audio frontend (native/libtpat_audio.so) parity vs the
Python implementations.  Skipped when the library isn't built
(``make -C native``)."""

import os
import numpy as np
import pytest

from tpat_tpu.data import native
from tpat_tpu.data.wav import load_wav_python, save_wav
from tpat_tpu.ops import fbank as fb

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (make -C native)"
)


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nat") / "x.wav")
    rng = np.random.default_rng(0)
    wave = np.clip(rng.normal(size=24000) * 0.2, -1, 1).astype(np.float32)
    save_wav(path, wave, 16000)
    return path


def test_native_decode_matches_python(wav_file):
    w_py, sr_py = load_wav_python(wav_file)
    w_c, sr_c = native.load_wav(wav_file)
    assert sr_c == sr_py == 16000
    np.testing.assert_array_equal(w_c, w_py)


def test_native_fbank_matches_numpy(wav_file):
    w, sr = load_wav_python(wav_file)
    mel_py = fb.fbank_numpy(w[0])
    mel_c = native.fbank(w[0], sr, 128)
    assert mel_c.shape == mel_py.shape
    np.testing.assert_allclose(mel_c, mel_py, atol=2e-4)


def test_native_fbank_povey_window(wav_file):
    """Kaldi's default povey window (hanning^0.85) through the C ABI."""
    w, sr = load_wav_python(wav_file)
    mel_py = fb.fbank_numpy(w[0], fb.FbankConfig(window_type="povey"))
    mel_c = native.fbank(w[0], sr, 128, window_type="povey")
    np.testing.assert_allclose(mel_c, mel_py, atol=2e-4)
    # and povey genuinely differs from hanning
    assert np.abs(mel_c - native.fbank(w[0], sr, 128)).max() > 1e-3


def test_native_stereo_decode(tmp_path):
    path = str(tmp_path / "st.wav")
    rng = np.random.default_rng(1)
    wave = np.clip(rng.normal(size=(2, 4000)) * 0.2, -1, 1).astype(np.float32)
    save_wav(path, wave, 8000)
    w_c, sr = native.load_wav(path)
    w_py, _ = load_wav_python(path)
    assert w_c.shape == (2, 4000) and sr == 8000
    np.testing.assert_array_equal(w_c, w_py)


def _wav_bytes(fmt, bits, payload, sr=16000, ch=1):
    import struct

    block = ch * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt, ch, sr, sr * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_native_rejects_float_wav_with_non32_bits(tmp_path):
    """format=3 (IEEE float) with bits!=32 must ERROR (rc!=0), not fall
    into the integer-PCM branches and silently decode garbage."""
    import struct

    bad = tmp_path / "f3b16.wav"
    bad.write_bytes(_wav_bytes(3, 16, struct.pack("<4h", 0, 1, -1, 2)))
    with pytest.raises(IOError, match="native wav decode failed"):
        native.load_wav(str(bad))

    # the legitimate float WAV keeps working (and round-trips exactly)
    vals = np.array([0.0, 0.25, -0.5, 1.0], np.float32)
    good = tmp_path / "f3b32.wav"
    good.write_bytes(_wav_bytes(3, 32, vals.tobytes()))
    w, sr = native.load_wav(str(good))
    assert sr == 16000
    np.testing.assert_array_equal(w, vals[None])


def test_native_negative_int32_samples(tmp_path):
    """Full-scale negative 32-bit PCM exercises the top-byte>=0x80 path
    of read_u32 (previously signed-shift UB)."""
    import struct

    vals = np.array([-(2**31), 2**31 - 1, -1, 0], np.int32)
    p = tmp_path / "i32.wav"
    p.write_bytes(_wav_bytes(1, 32, vals.tobytes()))
    w, sr = native.load_wav(str(p))
    np.testing.assert_allclose(
        w[0], vals.astype(np.float64) / 2**31, atol=2**-31
    )


def test_native_fbank_thread_scaling():
    """The _host_fbank heuristic (data/datasets.py) picks the native
    GIL-free kernel when cores allow on the claim that it parallelizes
    under the loader's thread pool — validate that claim wherever this
    test runs on a multi-core host: 4 threads must beat 1 thread by
    well over the no-scaling ratio (>= 1.5x here; near-linear is typical
    for a GIL-free kernel).  Skips on single-core hosts (the image this
    framework is built in has one core), activating automatically on
    real TPU-VM hosts."""
    import threading
    import time

    if not native.available():
        pytest.skip("native library not built")
    try:
        cores = len(os.sched_getaffinity(0))
    except AttributeError:
        cores = os.cpu_count() or 1
    if cores < 4:
        pytest.skip(f"needs >=4 cores for a scaling claim, have {cores}")

    sr = 16000
    rng = np.random.default_rng(0)
    wave = rng.normal(size=sr * 5).astype(np.float32)  # one 5-s clip
    native.fbank(wave, sr)  # warm any lazy init

    def run_batch(n_threads, clips_per_thread=8):
        def work():
            for _ in range(clips_per_thread):
                native.fbank(wave, sr)

        threads = [threading.Thread(target=work) for _ in range(n_threads)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        total = n_threads * clips_per_thread
        return (time.perf_counter() - t0) / total  # seconds per clip

    per_clip_1 = min(run_batch(1) for _ in range(3))
    per_clip_4 = min(run_batch(4) for _ in range(3))
    speedup = per_clip_1 / per_clip_4
    # 1.5x, not the ~4x a GIL-free kernel typically shows: the bound must
    # separate "scales" from "GIL-serialized" (<=1.0x) without flaking on
    # hosts whose other cores are busy (a concurrent build can halve the
    # effective core count across all three min-of repeats)
    assert speedup >= 1.5, (
        f"native fbank does not scale under threads: 1t {per_clip_1*1e3:.2f} "
        f"ms/clip vs 4t {per_clip_4*1e3:.2f} ms/clip (speedup {speedup:.2f}x)"
    )
