"""Round-trip and format tests for the pure-numpy COCO RLE codec."""

import numpy as np

from tce_rvos_tpu.utils import rle


def test_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(20):
        h, w = rng.randint(1, 64, 2)
        m = (rng.rand(h, w) > 0.7).astype(np.uint8)
        enc = rle.encode(m)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(dec, m)
        assert rle.area(enc) == int(m.sum())


def test_roundtrip_edge_cases():
    for m in [
        np.zeros((5, 7), np.uint8),
        np.ones((5, 7), np.uint8),
        np.eye(8, dtype=np.uint8),
    ]:
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_counts_column_major():
    # column-major: a full first column = run of h ones after 0 zeros
    m = np.zeros((3, 2), np.uint8)
    m[:, 0] = 1
    assert rle.encode_counts(m) == [0, 3, 3]


def test_iou():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b[2:7] = 1
    expected = 30 / 70
    assert abs(rle.iou(rle.encode(a), rle.encode(b)) - expected) < 1e-9
