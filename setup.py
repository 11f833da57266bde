"""Build hook: compile the native rANS coder at install time.

The reference builds two pybind11 extensions (CompressAI/setup.py:56-90).
Here the native component is a plain C-ABI shared library loaded with
ctypes (no pybind11 in the image), so "building the extension" is a single
g++ invocation; `lmic_tpu.entropy.coder` also does this lazily on first use
for source checkouts, making the install-time build an optimization, not a
requirement.
"""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = Path(__file__).parent / "lmic_tpu" / "csrc" / "lmic_rans.cc"
        out_dir = Path(self.build_lib) / "lmic_tpu" / "csrc"
        out_dir.mkdir(parents=True, exist_ok=True)
        out = out_dir / "liblmic_rans.so"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", str(out), str(src)],
            check=True,
        )


setup(cmdclass={"build_py": BuildWithNative})
