"""Native host-runtime ops (C extension) with availability probing."""

try:
    from tce_rvos_tpu.native import _rle_native as rle_native  # noqa: F401

    HAS_NATIVE = True
except ImportError:  # pragma: no cover - build-environment dependent
    rle_native = None
    HAS_NATIVE = False
