"""Build the native IO runtime extension:

    python setup.py build_ext --inplace

The package works without it (pure-numpy fallbacks in vampomi_tpu.io), but
the native path streams f64 marker slabs into f32 with no full-size f64
temporary and parallelizes file reads across threads.
"""

from setuptools import Extension, setup

setup(
    name="vampomi_tpu",
    version="0.1.0",
    packages=[
        "vampomi_tpu",
        "vampomi_tpu.io",
        "vampomi_tpu.ops",
        "vampomi_tpu.prior",
        "vampomi_tpu.glm",
        "vampomi_tpu.engine",
        "vampomi_tpu.modes",
        "vampomi_tpu.sim",
        "vampomi_tpu.scripts",
    ],
    ext_modules=[
        Extension(
            "vampomi_tpu._native",
            sources=["native/vampomi_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
            language="c++",
        )
    ],
)
