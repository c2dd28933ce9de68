"""Build hook: compile the native host-kernel library into the wheel.

Counterpart of the reference's build story (CMakeLists.txt +
src/python/setup.py + src/python_run/setup.py): `pip install .` gives a
working `piper-tpu` CLI with the C++ host kernels (csrc/) compiled into
piper_tpu/native/. The kernels are optional — every entry point in
piper_tpu.native has a numpy fallback — so a missing C++ toolchain
degrades the install instead of failing it.
"""

import logging
import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).resolve().parent
LIB_NAME = "libpiper_tpu_native.so"


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = ROOT / "csrc" / "piper_tpu_native.cpp"
        cxx = shutil.which("g++") or shutil.which("clang++")
        if not src.exists() or cxx is None:
            logging.warning(
                "piper_tpu: C++ toolchain or csrc/ missing; "
                "installing with numpy fallbacks only"
            )
            return
        out_dir = Path(self.build_lib) / "piper_tpu" / "native"
        out_dir.mkdir(parents=True, exist_ok=True)
        out = out_dir / LIB_NAME
        cmd = [
            cxx, "-O3", "-fPIC", "-shared", "-std=c++17",
            "-Wall", "-Wextra", "-o", str(out), str(src),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (subprocess.SubprocessError, OSError) as e:
            logging.warning("piper_tpu: native build failed (%s); "
                            "installing with numpy fallbacks only", e)


setup(cmdclass={"build_py": BuildWithNative})
