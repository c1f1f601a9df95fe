"""Packaging shim: builds the optional C++ batch loader into the wheel.

The loader (native/npy_loader.cpp) is a plain ctypes shared library, not a
CPython extension, so it is compiled directly with g++ into
``vcr_tpu/data/_libnpy.so`` during build_py. The build is best-effort: when
the toolchain is unavailable the wheel ships without it and
``vcr_tpu.data.native`` falls back to the pure-numpy batch path (and, in a
source checkout, self-builds on first use). All metadata lives in
pyproject.toml.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "native", "npy_loader.cpp")


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        if not os.path.exists(_SRC):
            return
        out = os.path.join(self.build_lib, "vcr_tpu", "data", "_libnpy.so")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 _SRC, "-o", out],
                check=True, capture_output=True, timeout=300)
        except Exception:  # optional component — numpy fallback at runtime
            pass


class BinaryDistribution(Distribution):
    # The bundled .so is platform-specific; force a platform wheel tag.
    def has_ext_modules(self):
        return os.path.exists(_SRC)


setup(cmdclass={"build_py": BuildPyWithNative},
      distclass=BinaryDistribution)
