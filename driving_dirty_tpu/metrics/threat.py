"""Official task metrics: roadmap threat score and box average threat score.

Parity targets:
  * compute_ts_road_map — /root/reference/src/utils/helper.py:74-77
  * compute_ats_bounding_boxes — /root/reference/src/utils/helper.py:33-72

`ts_road_map` is pure jnp (device-side, fuses into the eval step).
`ats_bounding_boxes` runs host-side: the reference's double Python loop over
an AABB-prefiltered pair matrix becomes a vectorized prefilter + exact convex
IoU only on surviving pairs (driving_dirty_tpu.metrics.polygon, no GEOS).
An optional native C++ kernel (driving_dirty_tpu.metrics._native) accelerates
the IoU loop when built.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from driving_dirty_tpu.metrics.polygon import box_iou

IOU_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def ts_road_map(road_map1, road_map2):
    """Pixel threat score TP / (P1 + P2 - TP). Inputs broadcastable {0,1} maps."""
    a = jnp.asarray(road_map1, jnp.float32)
    b = jnp.asarray(road_map2, jnp.float32)
    tp = jnp.sum(a * b)
    return tp / (jnp.sum(a) + jnp.sum(b) - tp)


def _pairwise_iou_matrix(boxes1, boxes2):
    """IoU for all pairs passing the axis-aligned overlap prefilter
    (/root/reference/src/utils/helper.py:47-57)."""
    b1 = np.asarray(boxes1, dtype=np.float64)  # [N1, 2, 4]
    b2 = np.asarray(boxes2, dtype=np.float64)  # [N2, 2, 4]
    n1, n2 = len(b1), len(b2)
    max1, min1 = b1.max(axis=2), b1.min(axis=2)  # [N1, 2]
    max2, min2 = b2.max(axis=2), b2.min(axis=2)
    cond = (
        (max1[:, None, 0] > min2[None, :, 0])
        & (min1[:, None, 0] < max2[None, :, 0])
        & (max1[:, None, 1] > min2[None, :, 1])
        & (min1[:, None, 1] < max2[None, :, 1])
    )
    iou = np.zeros((n1, n2))
    try:
        from driving_dirty_tpu.metrics import _native  # C++ fast path

        return _native.masked_pair_iou(b1, b2, cond)
    except ImportError:
        pass
    for i, j in zip(*np.nonzero(cond)):
        iou[i, j] = box_iou(b1[i], b2[j])
    return iou


def ats_bounding_boxes(boxes1, boxes2):
    """IoU-threshold-weighted average threat score between two box sets.

    boxes1/boxes2: [N, 2, 4] meter-space corner boxes. Thresholds {0.5..0.9}
    weighted by 1/t, TS(t) = TP / (N1 + N2 - TP), exactly as
    /root/reference/src/utils/helper.py:59-72 (including `iou_max` being the
    max over boxes1 for each box2).
    """
    boxes1 = np.asarray(boxes1)
    boxes2 = np.asarray(boxes2)
    n1, n2 = len(boxes1), len(boxes2)
    if n1 == 0 or n2 == 0:
        return 0.0
    iou = _pairwise_iou_matrix(boxes1, boxes2)
    iou_max = iou.max(axis=0)  # [N2]
    total, weight = 0.0, 0.0
    for t in IOU_THRESHOLDS:
        tp = float((iou_max > t).sum())
        total += (1.0 / t) * (tp / (n1 + n2 - tp))
        weight += 1.0 / t
    return total / weight
