"""Build the native host data-path extension:

    cd uniir_tpu/native && python setup.py build_ext --inplace

(or just import uniir_tpu.native -- it builds on first use and falls back to
pure Python if no compiler is available).
"""

from setuptools import Extension, setup

setup(
    name="uniir_tpu_native",
    ext_modules=[
        Extension(
            "fastjsonl",
            sources=["fastjsonl.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread", "-fvisibility=hidden"],
            extra_link_args=["-pthread"],
            language="c++",
        )
    ],
)
