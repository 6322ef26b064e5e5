"""Native C++ metric kernels vs the pure-Python oracle."""
import numpy as np
import pytest

native = pytest.importorskip("driving_dirty_tpu.metrics._native")

from driving_dirty_tpu.metrics.polygon import box_iou
from driving_dirty_tpu.utils.raster_pil import boxes_to_binary_map_pil


def _rot_boxes(rng, n):
    out = []
    for _ in range(n):
        cx, cy = rng.uniform(-30, 30, 2)
        w, h = rng.uniform(1, 4), rng.uniform(2, 6)
        ang = rng.uniform(0, np.pi)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        local = np.array([[+w, +w, -w, -w], [+h, -h, +h, -h]])
        out.append(R @ local + np.array([[cx], [cy]]))
    return np.stack(out)


def test_masked_pair_iou_matches_python_oracle():
    rng = np.random.RandomState(0)
    b1, b2 = _rot_boxes(rng, 12), _rot_boxes(rng, 9)
    cond = np.ones((12, 9), bool)
    got = native.masked_pair_iou(b1, b2, cond)
    for i in range(12):
        for j in range(9):
            assert np.isclose(got[i, j], box_iou(b1[i], b2[j]), atol=1e-9), (i, j)


def test_masked_pair_iou_respects_mask():
    rng = np.random.RandomState(1)
    b = _rot_boxes(rng, 4)
    cond = np.zeros((4, 4), bool)
    assert native.masked_pair_iou(b, b, cond).sum() == 0


def test_ats_uses_native_and_matches():
    from driving_dirty_tpu.metrics.threat import ats_bounding_boxes

    rng = np.random.RandomState(2)
    b = _rot_boxes(rng, 6)
    assert np.isclose(ats_bounding_boxes(b, b), 1.0)


def test_native_rasterizer_close_to_pil():
    rng = np.random.RandomState(3)
    boxes = _rot_boxes(rng, 5)
    ref = boxes_to_binary_map_pil(boxes)
    got = native.rasterize_boxes(boxes)
    mismatch = np.mean(ref != got)
    assert mismatch < 0.003, mismatch
