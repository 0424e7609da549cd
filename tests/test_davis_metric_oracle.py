"""Cross-validate our DAVIS metric core against the reference's vendored
davis2017 evaluator (VERDICT r4 item 4).

The trusted oracle is `/root/reference/davis2017/metrics.py` +
`evaluation.py::_evaluate_unsupervised` — the official DAVIS evaluator the
reference scores J&F with (`eval_davis.py:38-61`). It is pure
numpy/cv2/scipy, importable here directly; the only missing dependency is
scikit-image, from which `f_measure` lazily imports `morphology.disk`
(metrics.py:86). We shim that one function with the standard published
definition (a radius-r ball of the L2 metric: x^2 + y^2 <= r^2), written
independently below so the boundary-dilation comparison is not circular.

Coverage (>=100 randomized cases plus directed edge cases): db_eval_iou to
1e-9, db_eval_boundary / f_measure exact (both sides produce the same bmap
and dilation decisions, so F agrees to f64 rounding), db_statistics, and
the unsupervised Hungarian matching end-to-end on multi-object masks —
non-square frames, empty frames, empty predictions, full-frame masks, and
masks touching the image boundary.
"""

import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"


def _disk_standard(radius):
    """skimage.morphology.disk, from its published definition."""
    r = int(radius)
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    return (x * x + y * y <= r * r).astype(np.uint8)


@pytest.fixture(scope="module")
def oracle():
    # f_measure does `from skimage.morphology import disk` lazily; provide
    # the single function it needs (scikit-image is not installed here)
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        morph = types.ModuleType("skimage.morphology")
        morph.disk = _disk_standard
        skimage.morphology = morph
        sys.modules["skimage"] = skimage
        sys.modules["skimage.morphology"] = morph
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import davis2017.metrics as m
    import davis2017.utils as u
    from davis2017.evaluation import DAVISEvaluation

    return m, u, DAVISEvaluation


def _random_blob_mask(rng, h, w, thresh=0.6, smooth=9):
    """Random smooth blobs: threshold box-filtered noise."""
    import cv2

    noise = rng.rand(h, w).astype(np.float32)
    sm = cv2.blur(noise, (smooth, smooth))
    lo, hi = sm.min(), sm.max()
    if hi - lo < 1e-6:
        return np.zeros((h, w), bool)
    return (sm - lo) / (hi - lo) > thresh


def _case_masks(rng, case_idx):
    """One (gt, pred) pair; every 8th case is a directed edge case."""
    h = int(rng.randint(24, 97))
    w = int(rng.randint(24, 129))  # non-square by construction
    k = case_idx % 8
    if k == 5:  # empty prediction
        return _random_blob_mask(rng, h, w), np.zeros((h, w), bool)
    if k == 6:  # empty GT
        return np.zeros((h, w), bool), _random_blob_mask(rng, h, w)
    if k == 7:  # both empty
        return np.zeros((h, w), bool), np.zeros((h, w), bool)
    gt = _random_blob_mask(rng, h, w, thresh=0.55 + 0.1 * rng.rand())
    pred = _random_blob_mask(rng, h, w, thresh=0.55 + 0.1 * rng.rand())
    if k == 3:  # touching / containing the image boundary
        gt[:, :3] = True
        pred[-2:, :] = True
    if k == 4:  # full-frame mask vs blob
        gt = np.ones((h, w), bool)
    return gt, pred


def test_iou_and_boundary_match_oracle(oracle):
    m, _, _ = oracle
    from tce_rvos_tpu.eval import davis_eval as ours

    rng = np.random.RandomState(0)
    n_cases = 128
    for i in range(n_cases):
        gt, pred = _case_masks(rng, i)
        j_ref = float(m.db_eval_iou(gt, pred))
        j_ours = float(ours.db_eval_iou(gt, pred))
        assert abs(j_ref - j_ours) <= 1e-9, (i, j_ref, j_ours)

        f_ref = float(m.db_eval_boundary(gt, pred))
        f_ours = float(ours.db_eval_boundary(gt, pred))
        # same bmaps + same dilation decisions -> identical precision and
        # recall counts; only the final float division differs (f64 both
        # sides), so demand near-exact agreement
        assert abs(f_ref - f_ours) <= 1e-12, (i, f_ref, f_ours)


def test_bmap_and_dilation_decisions_exact(oracle):
    """The subtle core (VERDICT: 'Boundary-F is the subtle one'): compare the
    raw boundary maps and dilated maps bit-for-bit, not just the F scalar."""
    import cv2

    m, _, _ = oracle
    from tce_rvos_tpu.eval import davis_eval as ours

    rng = np.random.RandomState(1)
    for i in range(40):
        gt, pred = _case_masks(rng, i)
        for seg in (gt, pred):
            b_ref = np.asarray(m._seg2bmap(seg)).astype(bool)
            b_ours = np.asarray(ours.seg2bmap(seg)).astype(bool)
            assert (b_ref == b_ours).all(), f"bmap mismatch case {i}"
            bound_pix = np.ceil(0.008 * np.linalg.norm(seg.shape))
            d_ref = cv2.dilate(
                b_ref.astype(np.uint8), _disk_standard(bound_pix)
            )
            d_ours = cv2.dilate(
                b_ours.astype(np.uint8), ours._disk(bound_pix)
            )
            assert (d_ref == d_ours).all(), f"dilation mismatch case {i}"


def test_iou_3d_and_void_pixels(oracle):
    m, _, _ = oracle
    from tce_rvos_tpu.eval import davis_eval as ours

    rng = np.random.RandomState(2)
    gt = np.stack([_random_blob_mask(rng, 40, 61) for _ in range(6)])
    pred = np.stack([_random_blob_mask(rng, 40, 61) for _ in range(6)])
    gt[2] = 0  # empty frame inside the clip
    pred[3] = 0
    void = np.stack([_random_blob_mask(rng, 40, 61, thresh=0.8) for _ in range(6)])
    np.testing.assert_allclose(
        ours.db_eval_iou(gt, pred), m.db_eval_iou(gt, pred), atol=1e-12
    )
    np.testing.assert_allclose(
        ours.db_eval_iou(gt, pred, void), m.db_eval_iou(gt, pred, void),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        ours.db_eval_boundary(gt, pred), m.db_eval_boundary(gt, pred),
        atol=1e-12,
    )


def test_db_statistics_matches_oracle(oracle):
    _, u, _ = oracle
    from tce_rvos_tpu.eval import davis_eval as ours

    rng = np.random.RandomState(3)
    for n in (1, 2, 3, 4, 5, 7, 30, 67, 128):
        vals = rng.rand(n)
        if n > 4:
            vals[1] = np.nan  # davis treats nan frames as missing
        m_ref, o_ref, d_ref = u.db_statistics(vals)
        m_ours, o_ours, d_ours = ours.db_statistics(vals)
        for a, b in ((m_ref, m_ours), (o_ref, o_ours), (d_ref, d_ours)):
            if np.isnan(a):
                assert np.isnan(b)
            else:
                assert abs(float(a) - float(b)) <= 1e-12, (n, a, b)


def test_unsupervised_matching_matches_oracle(oracle):
    """End-to-end per-sequence scoring: multi-object GT vs proposal stacks
    through the Hungarian (J+F)/2 matching (evaluation.py:44-64)."""
    m, _, DAVISEvaluation = oracle
    from tce_rvos_tpu.eval import davis_eval as ours

    rng = np.random.RandomState(4)
    for case in range(8):
        n_obj = int(rng.randint(1, 4))
        n_prop = int(rng.randint(max(1, n_obj - 1), n_obj + 3))
        t, h, w = int(rng.randint(3, 7)), 36, 53
        gt = np.stack(
            [
                np.stack([_random_blob_mask(rng, h, w) for _ in range(t)])
                for _ in range(n_obj)
            ]
        ).astype(np.float64)
        # proposals = noisy copies of objects + distractors
        props = []
        for p in range(n_prop):
            if p < n_obj:
                noisy = gt[p].astype(bool) ^ (rng.rand(t, h, w) < 0.02)
            else:
                noisy = np.stack(
                    [_random_blob_mask(rng, h, w) for _ in range(t)]
                )
            props.append(noisy)
        pred = np.stack(props).astype(np.float64)
        if case == 5:
            pred[:] = 0  # all-empty predictions
        j_ref, f_ref = DAVISEvaluation._evaluate_unsupervised(
            gt, pred.copy(), None, ("J", "F")
        )
        j_ours, f_ours = ours.evaluate_unsupervised(gt, pred.copy())
        np.testing.assert_allclose(j_ours, j_ref, atol=1e-12)
        np.testing.assert_allclose(f_ours, f_ref, atol=1e-12)
