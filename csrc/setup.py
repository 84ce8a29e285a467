"""Build the native construction/compiler extension:

    python csrc/setup.py build_ext --inplace

places ``_polar_native.*.so`` next to the ``polar_tpu`` package (repo
root). ``polar_tpu.code.native`` loads it if present and falls back to
the pure-numpy implementation otherwise.
"""

import os

from setuptools import Extension, setup

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

setup(
    name="polar-tpu-native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "_polar_native",
            sources=["csrc/polar_native.c"],
            extra_compile_args=["-O3", "-std=c11"],
        )
    ],
    script_args=["build_ext", "--inplace"],
)
