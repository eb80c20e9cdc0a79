"""Build the native data-loader extension: python native/setup.py build_ext --inplace"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="ait_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "ait_native",
            sources=["ait_native.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-fopenmp", "-std=c++17"],
            extra_link_args=["-fopenmp"],
        )
    ],
)
