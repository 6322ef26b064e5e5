"""Stored-golden parity tests for the detection primitives (VERDICT r1 item 2).

torchvision is not installed in any environment this repo has seen, so these
goldens are HAND-DERIVED from torchvision's documented semantics and stored
as literal constants in tests/goldens/detection_goldens.json — independent of
the implementations under test (unlike the self-written oracles in
test_detection_ops.py). Deliberate divergences from torchvision are
enumerated in docs/DETECTION_PARITY.md.

Derivations (all arithmetic done by hand):

NMS 'pairs' case: IoU([0,0,10,10],[1,1,11,11]) = 81/119 = 0.6807 — suppressed
at thr 0.5, kept at 0.7; the duplicate box has IoU 1.0 with the top box.

NMS 'chain' case: A=[0,0,10,10] s.9, B=[5,0,15,10] s.8, C=[10,0,20,10] s.7.
IoU(A,B) = 50/150 = 1/3 > 0.3 so B dies; IoU(A,C) = 0; IoU(B,C) = 1/3 but B
is dead, so greedy NMS KEEPS C — the case a one-shot "suppress if any
higher-score overlap" implementation gets wrong.

Matcher: per-anchor best-gt IoUs are 1.0, 0.8, 0.16, 0.56, 0.75, 0.25, 0.25
(e.g. IoU([0,0,8,10],[0,0,10,10]) = 80/100). With fg 0.7 / bg 0.3: labels
[1, 1, 0, -1, 1, ...]; the two identical anchors at [50,50,52,52] have IoU
0.25 with gt2 — below bg — but are gt2's argmax overlap, so
allow_low_quality_matches forces BOTH ties positive.

RoIAlign (features f[y][x] = 4y + x): roi [0.5,0.5,2.5,2.5], out 1, ratio 2
samples at exactly-integer points (1,1),(1,2),(2,1),(2,2) -> mean of
5,6,9,10 = 7.5; each sample weight is 1/4, giving the gradient golden.
roi [0,0,2,2] samples at (0.5,0.5),(0.5,1.5),(1.5,0.5),(1.5,1.5) ->
bilinear values 2.5, 3.5, 6.5, 7.5 -> mean 5.0.

Box coding: anchor [0,0,10,10] (c=(5,5), w=h=10); deltas (0.1,0.2,0,0) ->
center (6,7), size 10 -> box [1,2,11,12]; with ROI weights (10,10,5,5) the
same box comes from deltas (1.0,2.0,0,0).
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from driving_dirty_tpu.ops import boxes as B
from driving_dirty_tpu.ops import detection as D

GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "goldens", "detection_goldens.json"))
)


def _nms_keep(boxes, scores, thr, max_out=None):
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    max_out = max_out or boxes.shape[0]
    idx, valid = D.nms_fixed(boxes, scores, thr, max_out)
    return list(np.asarray(idx)[np.asarray(valid)])


def test_nms_golden_cases():
    for case in GOLDENS["nms"]:
        keep = _nms_keep(case["boxes"], case["scores"], case["iou_threshold"])
        assert keep == case["keep"], case["name"]


def test_matcher_golden():
    g = GOLDENS["matcher"]
    anchors = jnp.asarray(g["anchors"], jnp.float32)
    gt = jnp.asarray(g["gt_boxes"], jnp.float32)
    valid = jnp.ones(len(g["gt_boxes"]), bool)
    labels, idx, best_iou = D.match_anchors(
        anchors, gt, valid, g["high_thresh"], g["low_thresh"]
    )
    np.testing.assert_allclose(np.asarray(best_iou), g["ious_to_best_gt"], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels), g["labels"])
    np.testing.assert_array_equal(np.asarray(idx), g["matched_gt"])


def test_roi_align_golden_forward_and_grad():
    f = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    for case in GOLDENS["roi_align"]:
        roi = jnp.asarray([case["roi"]], jnp.float32)
        out = D.roi_align(f, roi, output_size=case["output_size"],
                          sampling_ratio=case["sampling_ratio"])
        assert out.shape == (1, 1, 1, 1)
        np.testing.assert_allclose(float(out[0, 0, 0, 0]), case["expected"], rtol=1e-6)
        if "grad_nonzero" in case:
            grad = jax.grad(
                lambda ff: D.roi_align(
                    ff, roi, output_size=case["output_size"],
                    sampling_ratio=case["sampling_ratio"],
                ).sum()
            )(f)
            grad = np.asarray(grad)[..., 0]
            expect = np.zeros((4, 4))
            for key, v in case["grad_nonzero"].items():
                y, x = map(int, key.split(","))
                expect[y, x] = v
            np.testing.assert_allclose(grad, expect, atol=1e-6)


def test_box_coding_golden():
    g = GOLDENS["box_coding"]
    anchor = jnp.asarray([g["anchor"]], jnp.float32)
    dec = B.decode(jnp.asarray([g["deltas_w1"]], jnp.float32), anchor)
    np.testing.assert_allclose(np.asarray(dec)[0], g["decoded"], atol=1e-5)
    dec2 = B.decode(
        jnp.asarray([g["deltas_roi_weights"]], jnp.float32), anchor,
        tuple(g["roi_weights"]),
    )
    np.testing.assert_allclose(np.asarray(dec2)[0], g["decoded"], atol=1e-5)
    enc = B.encode(dec, anchor)
    np.testing.assert_allclose(np.asarray(enc)[0], g["deltas_w1"], atol=1e-5)


def test_batched_class_nms_golden():
    # forward_eval's per-class NMS via coordinate offsetting
    # (nn/detection.py): identical boxes of different classes never suppress
    # each other; same-class duplicates do.
    g = GOLDENS["batched_class_nms"]
    boxes = jnp.asarray(g["boxes"], jnp.float32)
    labels = jnp.asarray(g["labels"], jnp.float32)
    offset = labels[:, None] * 1000.0
    keep = _nms_keep(boxes + offset, g["scores"], g["iou_threshold"])
    assert keep == g["keep"]


def test_rpn_loss_golden_values():
    """End-to-end RPN loss VALUES on the 4-anchor/1-gt analytic case — pins
    the BCE objectness formula, the smooth-L1 beta=1/9, the forced-tie
    matching, and the sample-count normalizer (derivation in the goldens
    file). Values are sampler-independent by symmetry, so any rng passes."""
    from driving_dirty_tpu.nn.detection import DetectionConfig, FasterRCNNHead

    g = GOLDENS["rpn_loss"]
    c = g["config"]
    cfg = DetectionConfig(
        image_size=c["image_size"], feat_stride=c["feat_stride"],
        anchor_sizes=tuple(c["anchor_sizes"]),
        anchor_ratios=tuple(c["anchor_ratios"]),
        rpn_batch_per_image=c["rpn_batch_per_image"],
        exact_topk=c["exact_topk"],
    )
    head = FasterRCNNHead(cfg)
    obj = jnp.asarray([g["objectness"]], jnp.float32)
    dl = jnp.asarray([g["deltas"]], jnp.float32)
    gtb = jnp.asarray([[g["gt_box"]]], jnp.float32)
    gtv = jnp.ones((1, 1), bool)
    for seed in (0, 1, 2):  # sampler rng must not change the values
        ol, rl = head.rpn_loss(jax.random.PRNGKey(seed), obj, dl, gtb, gtv)
        np.testing.assert_allclose(float(ol), g["loss_objectness"], rtol=1e-5)
        np.testing.assert_allclose(float(rl), g["loss_rpn_box_reg"], rtol=1e-5)


def test_roi_loss_golden_values():
    """ROI head loss VALUES with analytically-controlled parameters (zeroed
    MLP => uniform class posteriors; bbox_pred bias = 0.1*arange): pins CE
    = ln K, the per-class regression slot selection, smooth-L1 beta=1, and
    the sum(take) normalizer that includes negatives."""
    from driving_dirty_tpu.nn.detection import DetectionConfig, FasterRCNNHead

    g = GOLDENS["roi_loss"]
    cfg = DetectionConfig(image_size=16)
    head = FasterRCNNHead(cfg)
    params = jax.tree.map(jnp.zeros_like, head.init(jax.random.PRNGKey(0)))
    nb = cfg.num_classes * 4
    params["bbox_pred"]["b"] = jnp.arange(nb, dtype=jnp.float32) * g["bbox_pred_bias_scale"]
    feats = jnp.zeros((1, 8, 8, cfg.backbone_channels), jnp.float32)
    sampled = {
        "rois": jnp.asarray([g["rois"]], jnp.float32),
        "cls_target": jnp.asarray([g["cls_target"]], jnp.int32),
        "reg_target": jnp.asarray([g["reg_target"]], jnp.float32),
        "is_pos": jnp.asarray([g["is_pos"]]),
        "take": jnp.asarray([g["take"]]),
    }
    cl, rl = head.roi_loss(params, feats, sampled)
    np.testing.assert_allclose(float(cl), g["loss_classifier"], rtol=1e-5)
    np.testing.assert_allclose(float(rl), g["loss_box_reg"], rtol=1e-5)


def test_postprocess_detections_golden():
    """forward_eval's post-processing chain end-to-end on the analytic
    3-proposal/2-class case: score floor, invalid-roi zeroing, candidate
    cap, per-class NMS via offsetting, cross-class score ordering."""
    from driving_dirty_tpu.nn.detection import DetectionConfig, FasterRCNNHead

    g = GOLDENS["postprocess"]
    c = g["config"]
    cfg = DetectionConfig(
        image_size=c["image_size"], num_classes=c["num_classes"],
        box_detections_per_img=c["box_detections_per_img"],
        box_score_thresh=c["box_score_thresh"], box_nms_thresh=c["box_nms_thresh"],
    )
    head = FasterRCNNHead(cfg)
    p = len(g["rois"])
    rois = jnp.asarray([g["rois"]], jnp.float32)
    rv = jnp.asarray([g["roi_valid"]])
    scores = jnp.asarray([g["scores"]], jnp.float32)
    reg = jnp.zeros((1, p, cfg.num_classes * 4), jnp.float32)
    out = head.postprocess_detections(rois, rv, scores, reg)
    valid = np.asarray(out["valid"])[0]
    np.testing.assert_array_equal(valid, g["expected_valid"])
    n = int(valid.sum())
    np.testing.assert_allclose(np.asarray(out["boxes"])[0][:n],
                               g["expected_boxes"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["scores"])[0][:n],
                               g["expected_scores"], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["labels"])[0][:n],
                                  g["expected_labels"])


def test_box_coding_clamp_golden():
    """decode clamps dw/dh at exactly log(1000/16); just below the clamp is
    NOT clamped."""
    g = GOLDENS["box_coding_clamp"]
    anchor = jnp.asarray([g["anchor"]], jnp.float32)
    dec = B.decode(jnp.asarray([g["deltas_clamped"]], jnp.float32), anchor)
    np.testing.assert_allclose(np.asarray(dec)[0], g["decoded_clamped"], rtol=1e-6)
    dec2 = B.decode(jnp.asarray([g["deltas_below_clamp"]], jnp.float32), anchor)
    np.testing.assert_allclose(np.asarray(dec2)[0], g["decoded_below_clamp"], rtol=1e-6)


def test_sampler_counts_golden():
    """BalancedPositiveNegativeSampler count semantics under positive
    scarcity / negative scarcity / positive surplus (exact path)."""
    g = GOLDENS["sampler_scarcity"]
    for case in g["cases"]:
        n = case["n_pos_avail"] + case["n_neg_avail"] + case["n_ignore"]
        labels = np.full(n, -1, np.int32)
        labels[:case["n_pos_avail"]] = 1
        labels[case["n_pos_avail"]:case["n_pos_avail"] + case["n_neg_avail"]] = 0
        rs = np.random.RandomState(0)
        rs.shuffle(labels)
        for seed in (0, 5):
            idx, is_pos, take = D.sample_balanced(
                jax.random.PRNGKey(seed), jnp.asarray(labels),
                g["num_samples"], g["positive_fraction"], approx=False,
            )
            assert int(np.sum(np.asarray(take))) == case["expect_total"], case
            assert int(np.sum(np.asarray(is_pos) & np.asarray(take))) == case["expect_pos"], case
            # every taken index really has the label its slot claims
            lab = labels[np.asarray(idx)]
            tk = np.asarray(take)
            assert (lab[np.asarray(is_pos) & tk] == 1).all()
            assert (lab[~np.asarray(is_pos) & tk] == 0).all()
