"""Build the native host-runtime extension (tce_rvos_tpu/native/rle_ext.c).
Pure-setuptools C extension (no pybind11); the Python layers fall back to
numpy implementations when the extension is absent."""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "tce_rvos_tpu.native._rle_native",
            sources=["tce_rvos_tpu/native/rle_ext.c"],
            extra_compile_args=["-O3"],
            optional=True,
        )
    ]
)
