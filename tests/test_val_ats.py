"""val_ats semantics: threshold filtering + hand-computed ATS values.

The reference's validation-step ATS (commented out at
bb_fast_rcnn_w_map.py:139-154) scores ALL returned detections; our eval
pipeline already floors scores at DetectionConfig.box_score_thresh (0.05), so
val_ats_score_thresh defaults to that same floor — every detection
forward_eval returns is scored. These tests drive the host-side metric path
with canned detections (model forward faked) against hand-computed ATS.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from driving_dirty_tpu.models.faster_rcnn import BBFasterRCNN

TINY = dict(
    batch_size=1, learning_rate=1e-3, pretrained_path=None,
    ae_hidden_dim=8, ae_latent_dim=8, max_bb=8,
    image_size=128, rpn_pre_nms_top_n=64, rpn_post_nms_top_n=16,
    box_batch_per_image=8,
    val_diag=0,  # these tests fake predict(); stage diagnostics need the real model
)

# GT: one 10x10 m box centred on the ego car. Meter corners [fl, fr, bl, br]:
# row 0 = x, row 1 = y (data_helper.py:118,129).
GT_CORNERS = np.array([[5.0, 5.0, -5.0, -5.0], [5.0, -5.0, 5.0, -5.0]], np.float32)
# pixel AABB of the same box: px = m*10 + 400 (y flip symmetric here)
GT_PX = [350.0, 350.0, 450.0, 450.0]
# a disjoint 10x10 m box (meters x 12..22, y -22..-12)
FAR_PX = [520.0, 520.0, 620.0, 620.0]


def _task(**hp_over):
    return BBFasterRCNN({**TINY, **hp_over})


def _fake_dets(boxes_px, scores):
    """[D,4] pixel boxes + scores -> canned predict() output for batch=1."""
    d = len(boxes_px)
    return {
        "boxes": jnp.asarray(np.asarray(boxes_px, np.float32)[None]),
        "scores": jnp.asarray(np.asarray(scores, np.float32)[None]),
        "labels": jnp.zeros((1, d), jnp.int32),
        "valid": jnp.ones((1, d), bool),
    }


def _batch():
    boxes = np.zeros((1, 8, 2, 4), np.float32)
    valid = np.zeros((1, 8), bool)
    boxes[0, 0] = GT_CORNERS
    valid[0, 0] = True
    return {
        "images": jnp.zeros((1, 6, 4, 4, 3)),  # unused: predict is faked
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
    }


def _run(task, dets):
    task._host_predict = lambda p, s, im, rd: dets
    return task.host_val_metrics(None, None, _batch(), bmask=np.array([True]))


def test_val_ats_default_thresh_is_eval_floor_and_scores_all_detections():
    # det A = exact GT match (score .9), det C = disjoint (score .5),
    # det B = sub-floor (score .03, below box_score_thresh 0.05 -> dropped).
    # Kept: {A, C}. iou_max(GT) = 1.0 > every threshold, so
    # TS(t) = 1 / (2 + 1 - 1) = 0.5 for all t -> ATS = 0.5 exactly.
    task = _task()
    m = _run(task, _fake_dets([GT_PX, FAR_PX, FAR_PX], [0.9, 0.5, 0.03]))
    val, weight = m["val_ats"]
    assert weight == 1.0
    assert np.isclose(val, 0.5), val


def test_val_ats_high_thresh_scores_only_confident():
    # raising the threshold to 0.6 keeps only det A -> perfect ATS 1.0
    task = _task(val_ats_score_thresh=0.6)
    m = _run(task, _fake_dets([GT_PX, FAR_PX], [0.9, 0.5]))
    val, _ = m["val_ats"]
    assert np.isclose(val, 1.0), val


def test_val_ats_counts_subfloor_when_thresh_zero():
    # thresh 0 keeps all three dets: TS(t) = 1 / (3 + 1 - 1) = 1/3
    task = _task(val_ats_score_thresh=0.0)
    m = _run(task, _fake_dets([GT_PX, FAR_PX, FAR_PX], [0.9, 0.5, 0.03]))
    val, _ = m["val_ats"]
    assert np.isclose(val, 1.0 / 3.0), val


def test_val_ats_disabled_flag():
    task = _task(val_ats=0)
    assert _run(task, _fake_dets([GT_PX], [0.9])) == {}
