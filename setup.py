"""Build hooks for tpat-tpu.

All package metadata lives in pyproject.toml; this file only adds the
optional native-frontend compile step: ``native/csrc/tpat_audio.cpp`` is
built into ``tpat_tpu/data/libtpat_audio.so`` inside the wheel so the
installed package gets the C++ WAV decoder + Kaldi fbank without a
source checkout (tpat_tpu/data/native.py looks next to itself first,
then falls back to the numpy frontend when the .so is absent).

The step is best-effort by design: no compiler (or TPAT_SKIP_NATIVE=1)
produces a pure-Python wheel that still works end to end.
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "native", "csrc", "tpat_audio.cpp")


def _will_embed_native() -> bool:
    """True when the build intends to embed the compiled .so.

    Decided up front (source present + compiler present + not skipped) so
    the wheel tag can be chosen before build_py runs: a wheel carrying a
    platform-specific ELF must NOT be tagged py3-none-any, or pip will
    happily install the dead .so on another platform.
    """
    if os.environ.get("TPAT_SKIP_NATIVE") == "1":
        return False
    if not os.path.exists(_SRC):  # building from a partial sdist
        return False
    return shutil.which(os.environ.get("CXX", "g++")) is not None


class _NativeDistribution(Distribution):
    def has_ext_modules(self):  # drives bdist_wheel's root_is_pure
        return _will_embed_native()


def _compile_native(out_path: str) -> bool:
    src = _SRC
    if not os.path.exists(src):  # building from a partial sdist
        return False
    cxx = os.environ.get("CXX", "g++")
    if shutil.which(cxx) is None:
        return False
    # Portable flags (no -march=native: the wheel may move machines).
    flags = os.environ.get(
        "TPAT_NATIVE_CXXFLAGS", "-O3 -fPIC -std=c++17 -Wall"
    ).split()
    cmd = [cxx, *flags, "-shared", "-o", out_path, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"tpat-tpu: native frontend build skipped ({e})", file=sys.stderr)
        return False
    return True


class build_py_with_native(build_py):
    def run(self):
        super().run()
        if os.environ.get("TPAT_SKIP_NATIVE") == "1":
            return
        out_dir = os.path.join(self.build_lib, "tpat_tpu", "data")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, "libtpat_audio.so")
        if _compile_native(out):
            print(f"tpat-tpu: built native frontend -> {out}")


setup(
    cmdclass={"build_py": build_py_with_native},
    distclass=_NativeDistribution,
)
