"""Faster-RCNN task tests: loss computation, gradients, eval detections.

Uses a small DetectionConfig (fewer proposals) to keep CPU runtime sane; the
full-size config is exercised on TPU by the CLI/bench paths.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"

import jax
import jax.numpy as jnp

from driving_dirty_tpu.models.faster_rcnn import BBFasterRCNN, FasterRCNNRoadMap
from driving_dirty_tpu.nn.detection import DetectionConfig, FasterRCNNHead

TINY = dict(
    batch_size=1, learning_rate=1e-3, pretrained_path=None,
    ae_hidden_dim=8, ae_latent_dim=8, max_bb=8,
    image_size=128, rpn_pre_nms_top_n=200, rpn_post_nms_top_n=64,
    box_batch_per_image=32,
)


def _batch(b=1, max_bb=8, img=128):
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, max_bb, 2, 4), np.float32)
    valid = np.zeros((b, max_bb), bool)
    cats = np.zeros((b, max_bb), np.int32)
    # two real boxes in meters
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    boxes[:, 1, 0] = [20, 20, 12, 12]
    boxes[:, 1, 1] = [-10, -18, -10, -18]
    valid[:, :2] = True
    cats[:, 0], cats[:, 1] = 3, 7
    return {
        "images": jnp.asarray(rng.rand(b, 6, 64, 76, 3).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
        "categories": jnp.asarray(cats),
        "road": jnp.asarray((rng.rand(b, img, img) > 0.5).astype(np.float32)),
    }


def test_head_shapes_small_config():
    cfg = DetectionConfig(image_size=64, rpn_pre_nms_top_n=50, rpn_post_nms_top_n=20)
    head = FasterRCNNHead(cfg)
    params = head.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 32).astype(np.float32))
    obj, dl = head.rpn_forward(params, feats)
    n = 32 * 32 * 15
    assert obj.shape == (2, n) and dl.shape == (2, n, 4)
    rois, rv, rs = head.proposals(obj, dl, train=False)
    assert rois.shape == (2, 20, 4) and rv.shape == (2, 20)
    dets = head.forward_eval(params, feats)
    assert dets["boxes"].shape == (2, 100, 4)
    assert dets["valid"].dtype == bool


@pytest.mark.parametrize("cls", [BBFasterRCNN, FasterRCNNRoadMap])
def test_faster_rcnn_loss_finite_and_grads_flow(cls):
    task = cls(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch(img=TINY["image_size"])

    def loss_fn(p):
        loss, (ns, metrics) = task.loss(p, state, batch, jax.random.PRNGKey(1), train=True)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k in ("loss_classifier", "loss_box_reg", "loss_objectness", "loss_rpn_box_reg"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # grads reach the detection head
    g = np.asarray(grads["head"]["rpn_conv"]["w"])
    assert np.abs(g).sum() > 0
    g2 = np.asarray(grads["head"]["cls_score"]["w"])
    assert np.abs(g2).sum() > 0
    if cls.uses_roadmap:
        assert np.abs(np.asarray(grads["mapper_cnn"]["w"])).sum() > 0


def test_faster_rcnn_predict_detections():
    task = BBFasterRCNN(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch(img=TINY["image_size"])
    dets = task.predict(params, state, batch["images"])
    assert dets["boxes"].shape[2] == 4
    assert dets["labels"].shape == dets["scores"].shape
    v = np.asarray(dets["valid"])
    s = np.asarray(dets["scores"])
    assert (s[~v] == 0).all()
    b = np.asarray(dets["boxes"])
    assert (b >= 0).all() and (b <= TINY["image_size"]).all()


def test_val_ats_plumbing_gt_roundtrip():
    """Feeding GT boxes back as predictions must score val_ats == 1.0
    (VERDICT r1 item 4: metric plumbing sanity for the training-loop ATS)."""
    from driving_dirty_tpu.ops.coords import corners_to_aabb

    task = BBFasterRCNN({**TINY, "val_diag": 0})  # predict() faked below
    batch = _batch(img=TINY["image_size"])
    b, max_bb = batch["boxes"].shape[:2]
    aabb = corners_to_aabb(batch["boxes"])  # GT as pixel AABBs
    task._host_predict = lambda p, s, im, rd: {
        "boxes": aabb,
        "scores": jnp.where(batch["box_valid"], 1.0, 0.0),
        "labels": batch["categories"],
        "valid": batch["box_valid"],
    }
    m = task.host_val_metrics({}, {}, batch, np.ones(b, bool))
    # (value, weight): the trainer weights this batch by the number of
    # images that actually had GT boxes
    val, w = m["val_ats"]
    assert val == pytest.approx(1.0)
    assert w > 0

    # and with no predictions, the score is 0 (not missing / NaN)
    task._host_predict = lambda p, s, im, rd: {
        "boxes": aabb,
        "scores": jnp.zeros((b, max_bb)),
        "labels": batch["categories"],
        "valid": jnp.zeros((b, max_bb), bool),
    }
    m0 = task.host_val_metrics({}, {}, batch, np.ones(b, bool))
    assert m0["val_ats"][0] == pytest.approx(0.0)


def test_faster_rcnn_no_gt_boxes_still_trains():
    task = BBFasterRCNN(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch(img=TINY["image_size"])
    batch = dict(batch)
    batch["box_valid"] = jnp.zeros_like(batch["box_valid"])
    loss, (ns, metrics) = task.loss(params, state, batch, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))


def test_predict_chunking_pads_non_multiple_batches():
    """predict() must chunk ANY batch larger than predict_chunk — a batch
    that is not a chunk multiple is padded to one and sliced back, never
    silently run unchunked (whose NMS temps scale with the full batch)."""
    task = FasterRCNNRoadMap(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch(b=5, img=TINY["image_size"])

    task.predict_chunk = 2  # b=5 -> pad to 6, lax.map over 3 chunks of 2
    out = task.predict(params, state, batch["images"], batch["road"])
    assert out["boxes"].shape[0] == 5
    task.predict_chunk = 8  # b=5 <= 8 -> single unchunked program
    ref = task.predict(params, state, batch["images"], batch["road"])
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-5, err_msg=k)


def test_stage_diagnostics_real_model():
    """host_val_metrics with val_diag on runs the real stage-wise tap and
    returns well-formed (value, weight) diagnostics (VERDICT r3 item 1a)."""
    task = BBFasterRCNN(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch(img=TINY["image_size"])
    m = task.host_val_metrics(params, state, batch, np.ones(1, bool))
    assert "val_rpn_recall" in m and "val_prop_cov" in m
    for key in ("val_rpn_recall", "val_prop_cov"):
        val, w = m[key]
        assert 0.0 <= val <= 1.0
        assert w == 2.0  # two GT boxes in the batch
    if "val_cls_acc" in m:
        val, w = m["val_cls_acc"]
        assert 0.0 <= val <= 1.0 and 0 < w <= 2.0
    assert "val_det_kept" in m


def test_perfect_proposals_give_full_recall_and_coverage():
    """If the proposal stage returns the GT AABBs themselves, the diagnostics
    must report recall 1.0 / coverage 1.0 — pins the IoU/matching math."""
    from driving_dirty_tpu.ops.coords import corners_to_aabb

    task = BBFasterRCNN(TINY)
    batch = _batch(img=TINY["image_size"])
    aabb = corners_to_aabb(batch["boxes"])  # [1, max_bb, 4]
    k = task.cfg.num_classes
    # fake the jitted diag tap: GT boxes as proposals, uniform class scores
    task._host_diag = lambda p, s, im, rd: {
        "rois": aabb,
        "roi_valid": batch["box_valid"],
        "cls": jnp.ones((1, aabb.shape[1], k)) / k,
    }
    m = task._stage_diagnostics({}, {}, batch, np.ones(1, bool))
    assert m["val_rpn_recall"][0] == pytest.approx(1.0)
    assert m["val_prop_cov"][0] == pytest.approx(1.0)


def test_head_config_plumbing_and_torchvision_init():
    """anchor_sizes/anchor_ratios/rpn_head_dilations/rpn_head_norm reach the
    DetectionConfig from hparams (string and tuple forms), and the head init
    follows torchvision semantics: RPN convs + predictors normal(std 0.01 /
    0.001) with zero bias — the He-default init measurably breaks training
    (O(1) deltas rescale boxes ~3.6x at init; scripts/probe_det_learn.py)."""
    task = BBFasterRCNN({**TINY, "anchor_sizes": "44", "anchor_ratios": "1.0",
                         "rpn_head_dilations": "2,4", "rpn_head_norm": 1})
    assert task.cfg.anchor_sizes == (44,)
    assert task.cfg.anchor_ratios == (1.0,)
    assert task.cfg.rpn_head_dilations == (2, 4)
    assert task.cfg.rpn_head_norm is True
    assert task.cfg.num_anchors_per_cell == 1
    params, _ = task.init(jax.random.PRNGKey(0))
    head = params["head"]
    assert "rpn_conv_d2" in head and "rpn_conv_d4" in head
    for name, std in (("rpn_conv", 0.01), ("rpn_cls", 0.01),
                      ("rpn_reg", 0.01), ("cls_score", 0.01),
                      ("bbox_pred", 0.001)):
        w = np.asarray(head[name]["w"])
        assert abs(w.std() - std) < std * 0.35, (name, w.std())
        assert np.all(np.asarray(head[name]["b"]) == 0), name


def test_dilated_normed_head_forward_and_grads():
    task = BBFasterRCNN({**TINY, "anchor_sizes": "44", "anchor_ratios": "1.0",
                         "rpn_head_dilations": "2,4", "rpn_head_norm": 1})
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch(img=TINY["image_size"])

    def loss_fn(p):
        loss, _ = task.loss(p, state, batch, jax.random.PRNGKey(1), train=True)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["head"]["rpn_conv_d4"]["w"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    dets = task.predict(params, state, batch["images"])
    assert np.isfinite(np.asarray(dets["boxes"])).all()
