"""Metric parity tests: threat scores and polygon IoU vs shapely-free oracle
(and vs shapely itself when available)."""
import numpy as np
import jax.numpy as jnp
import pytest

from driving_dirty_tpu.metrics import polygon, threat


def _rot_box(cx, cy, w, h, ang):
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    local = np.array([[+w, +w, -w, -w], [+h, -h, +h, -h]], dtype=np.float64)
    return R @ local + np.array([[cx], [cy]])


def test_ts_road_map_basic():
    a = np.zeros((8, 8))
    b = np.zeros((8, 8))
    a[:4] = 1  # 32 px
    b[2:6] = 1  # 32 px, overlap 16
    ts = float(threat.ts_road_map(jnp.asarray(a), jnp.asarray(b)))
    assert np.isclose(ts, 16 / (32 + 32 - 16))


def test_ts_road_map_identical_is_one():
    a = (np.random.RandomState(0).rand(50, 50) > 0.5).astype(np.float32)
    assert np.isclose(float(threat.ts_road_map(a, a)), 1.0)


def test_box_iou_axis_aligned_exact():
    b1 = np.array([[2.0, 2.0, 0.0, 0.0], [2.0, 0.0, 2.0, 0.0]])  # unit square scaled: [0,2]^2
    b2 = b1 + np.array([[1.0], [1.0]])  # shifted by (1,1): overlap 1, union 7
    assert np.isclose(polygon.box_iou(b1, b2), 1 / 7)


def test_box_iou_rotated_against_shapely_if_available():
    shapely = pytest.importorskip("shapely.geometry")
    rng = np.random.RandomState(0)
    for _ in range(25):
        b1 = _rot_box(*rng.uniform(-5, 5, 2), rng.uniform(1, 4), rng.uniform(1, 4), rng.uniform(0, np.pi))
        b2 = _rot_box(*rng.uniform(-5, 5, 2), rng.uniform(1, 4), rng.uniform(1, 4), rng.uniform(0, np.pi))
        p1 = shapely.Polygon(b1.T).convex_hull
        p2 = shapely.Polygon(b2.T).convex_hull
        ref = p1.intersection(p2).area / p1.union(p2).area
        assert np.isclose(polygon.box_iou(b1, b2), ref, atol=1e-9)


def test_ats_bounding_boxes_perfect_match():
    boxes = np.stack([_rot_box(5, 5, 2, 1, 0.3), _rot_box(-5, -5, 1, 2, 1.0)])
    ats = threat.ats_bounding_boxes(boxes, boxes)
    assert np.isclose(ats, 1.0)


def test_ats_bounding_boxes_reference_formula():
    # One predicted box exactly matching one of two ground truths:
    # iou_max over gt-axis -> per-pred; TP at every threshold = 1.
    gt = np.stack([_rot_box(0, 0, 2, 1, 0.0), _rot_box(10, 10, 2, 1, 0.0)])
    pred = gt[:1]
    ats = threat.ats_bounding_boxes(pred, gt)
    # n1=1 (pred=boxes1), n2=2; iou_max over boxes1 per gt -> [1, 0]; tp=1
    expected_ts = 1.0 / (1 + 2 - 1)
    assert np.isclose(ats, expected_ts)


def test_ats_empty_sets():
    assert threat.ats_bounding_boxes(np.zeros((0, 2, 4)), np.zeros((3, 2, 4))) == 0.0
