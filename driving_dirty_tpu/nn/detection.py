"""Faster-RCNN on TPU: RPN + ROI heads as one fixed-shape compiled program.

Replaces torchvision's `FasterRCNN` (used by the reference at
/root/reference/src/bounding_box_model/fast_rcnn/bb_fast_rcnn.py:61-72 with a
frozen SSL conv backbone, AnchorGenerator(sizes=(32..512), ratios=(.5,1,2)),
MultiScaleRoIAlign(output 7, sampling 2), num_classes=9).

Every data-dependent-size op in the torchvision pipeline (proposal counts,
NMS survivors, per-image box counts, balanced samplers) is re-expressed
fixed-shape with validity masks so the whole train/eval step is ONE XLA
program (SURVEY.md hard-part 1):

  * anchors: dense grid, scored in bulk; top-k pre-NMS instead of per-image
    variable filtering;
  * matching: grid-factored labels (ops.detection.match_labels_grid) — never
    builds the [2.4M anchors x gt] matrix; matched-gt indices recomputed for
    the sampled subset only (ops.detection.match_subset);
  * NMS: ops.detection.nms_fixed (scan over sorted candidates);
  * samplers: noise+top-k (ops.detection.sample_balanced);
  * RoIAlign: one fused gather (ops.detection.roi_align).

Training losses follow torchvision semantics: RPN binary objectness CE +
smooth-L1 (beta 1/9) on positives over a 256-anchor balanced sample; ROI
heads: 512 sampled proposals (pos fraction 0.25, fg IoU >= 0.5, GT appended
to proposals), class CE + smooth-L1 on the matched class's regression slot.
The loss dict keys match the reference's logs: loss_classifier, loss_box_reg,
loss_objectness, loss_rpn_box_reg (bb_fast_rcnn.py:112-118).

Labels use the raw dataset category ids (0..8) exactly as the reference feeds
them (bb_fast_rcnn.py:172-188) — including the quirk that category 0 collides
with the background label.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from driving_dirty_tpu.core import layers as L
from driving_dirty_tpu.ops import boxes as box_ops
from driving_dirty_tpu.ops import detection as det
from driving_dirty_tpu.ops.detection import NEG_INF

RPN_BOX_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
ROI_BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    image_size: int = 800
    feat_stride: int = 2          # backbone c3 stride on the 800x800 layout image
    num_classes: int = 9          # bb_fast_rcnn.py:69
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    rpn_pre_nms_top_n: int = 2000
    rpn_post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_thresh: float = 0.7
    rpn_bg_thresh: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    box_fg_thresh: float = 0.5
    box_batch_per_image: int = 512
    box_positive_fraction: float = 0.25
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    box_detections_per_img: int = 100
    roi_output_size: int = 7
    roi_sampling_ratio: int = 2
    backbone_channels: int = 32
    # Pre-NMS proposal selection: jax.lax.approx_max_k is the TPU-native
    # partial-reduction top-k (measured 3.4 vs 28 ms per 8 images over the
    # 2.4M-anchor scores); recall ~=0.95 only perturbs proposals at the
    # score cutoff, which post-NMS top-1000 makes irrelevant in practice.
    # exact_topk=True restores bitwise torchvision-style selection.
    exact_topk: bool = False
    # NMS implementation: 0 = convergence-checked while loop; N > 0 = N
    # straight-line suppression applications (no loop control overhead;
    # exact greedy for dependency chains < N — see ops.detection.nms_fixed
    # fixed_depth and scripts/probe_nms_depth.py for the TPU measurement)
    nms_fixed_depth: int = 0
    mlp_dim: int = 1024
    # Extra dilated 3x3 convs in the RPN head, applied after the standard
    # rpn_conv. Default EMPTY = torchvision-parity single-conv head. The
    # reference's c3 backbone has a ~7 px receptive field — far below its
    # own anchor sizes (32..512) — so RPN objectness physically cannot tell
    # a box center from any other box-interior cell, and pre-NMS top-k
    # degenerates into a tie lottery (measured: AUC 0.91 with recall ~0,
    # scripts/probe_det_learn.py). Each extra conv with dilation d adds
    # 2*d*feat_stride px of RF; (4, 8, 16, 32) brings the head to ~250 px
    # at stride 2, covering mid-size anchors. ~37k extra params.
    rpn_head_dilations: tuple = ()
    # Per-cell RMS normalization inside the RPN head (after each ReLU).
    # Default OFF = parity. The c3 trunk has no normalization anywhere, so
    # zero-padding artifacts compound through the conv stack and make
    # border/corner cells' activation MAGNITUDE extreme — at init the
    # entire pre-NMS top-2000 lands in the image corners (reproduced on
    # synthetic data: all proposals within ~40 px of corners, IoU 0.0 with
    # every interior GT) and training wrestles the artifact instead of the
    # task. Normalizing each cell's feature vector to unit RMS bounds every
    # cell's score scale; salience must then be expressed in feature
    # DIRECTION, which is learnable signal rather than init pathology.
    rpn_head_norm: bool = False

    @property
    def num_anchors_per_cell(self):
        return len(self.anchor_sizes) * len(self.anchor_ratios)

    @property
    def feat_size(self):
        return self.image_size // self.feat_stride


class FasterRCNNHead:
    """Parameters + pure apply functions for RPN and ROI heads."""

    def __init__(self, cfg: DetectionConfig = DetectionConfig()):
        self.cfg = cfg
        c = cfg.backbone_channels
        a = cfg.num_anchors_per_cell
        self.rpn_conv = L.Conv2d(c, c, 3, 1, 1)
        # optional RF-expansion stack (cfg.rpn_head_dilations); empty = parity
        self.rpn_extra = {
            f"rpn_conv_d{d}": L.Conv2d(c, c, 3, 1, d, d)
            for d in cfg.rpn_head_dilations
        }
        self.rpn_cls = L.Conv2d(c, a, 1)
        self.rpn_reg = L.Conv2d(c, 4 * a, 1)
        flat = cfg.roi_output_size * cfg.roi_output_size * c
        self.box_fc1 = L.Linear(flat, cfg.mlp_dim)
        self.box_fc2 = L.Linear(cfg.mlp_dim, cfg.mlp_dim)
        self.cls_score = L.Linear(cfg.mlp_dim, cfg.num_classes)
        self.bbox_pred = L.Linear(cfg.mlp_dim, cfg.num_classes * 4)
        self._anchors = None

    def init(self, key):
        ks = jax.random.split(key, 7 + len(self.rpn_extra))
        params = {
            "rpn_conv": self.rpn_conv.init(ks[0]),
            "rpn_cls": self.rpn_cls.init(ks[1]),
            "rpn_reg": self.rpn_reg.init(ks[2]),
            "box_fc1": self.box_fc1.init(ks[3]),
            "box_fc2": self.box_fc2.init(ks[4]),
            "cls_score": self.cls_score.init(ks[5]),
            "bbox_pred": self.bbox_pred.init(ks[6]),
        }
        for i, (name, conv) in enumerate(self.rpn_extra.items()):
            params[name] = conv.init(ks[7 + i])
        # torchvision init semantics (a REAL parity knob, not cosmetics):
        # RPNHead convs are normal(std=0.01) + zero bias, FastRCNNPredictor
        # cls_score std=0.01 / bbox_pred std=0.001 + zero bias. The layer
        # default (He-uniform) puts O(1) deltas on every anchor at init —
        # decode then rescales boxes by up to exp(1.3) ~= 3.6x and the
        # pre-NMS top-k rides structured init noise instead of starting
        # near the anchor grid (measured: all init proposals degenerate,
        # IoU 0 with every GT).
        def renorm(p, key, std):
            p["w"] = std * jax.random.normal(key, p["w"].shape, p["w"].dtype)
            if "b" in p:
                p["b"] = jnp.zeros_like(p["b"])

        kn = jax.random.split(ks[0], 4)
        renorm(params["rpn_conv"], kn[0], 0.01)
        renorm(params["rpn_cls"], kn[1], 0.01)
        renorm(params["rpn_reg"], kn[2], 0.01)
        renorm(params["cls_score"], kn[3], 0.01)
        renorm(params["bbox_pred"], jax.random.split(kn[3])[0], 0.001)
        # the optional dilated RPN convs are part of the same head: keep the
        # init scheme consistent with rpn_conv (ADVICE r4)
        for i, name in enumerate(self.rpn_extra):
            renorm(params[name], jax.random.fold_in(kn[0], i + 1), 0.01)
        return params

    # ------------------------------------------------------------------
    def anchors(self):
        # cached as concrete numpy; jnp.asarray below is a constant under jit
        # (a traced cache here would leak tracers across jit boundaries)
        if self._anchors is None:
            cfg = self.cfg
            cells = det.base_anchors(cfg.anchor_sizes, cfg.anchor_ratios)
            self._anchors = det.grid_anchors(cfg.feat_size, cfg.feat_size, cfg.feat_stride, cells)
        return jnp.asarray(self._anchors)

    def rpn_forward(self, params, features):
        """features [b, Hf, Wf, C] -> (objectness [b, N], deltas [b, N, 4])."""
        cfg = self.cfg

        def norm(t):
            if not cfg.rpn_head_norm:
                return t
            return t * jax.lax.rsqrt(
                jnp.mean(jnp.square(t), axis=-1, keepdims=True) + 1e-6)

        t = norm(jax.nn.relu(self.rpn_conv.apply(params["rpn_conv"], features)))
        for name, conv in self.rpn_extra.items():
            t = norm(jax.nn.relu(conv.apply(params[name], t)))
        obj = self.rpn_cls.apply(params["rpn_cls"], t)            # [b, Hf, Wf, A]
        reg = self.rpn_reg.apply(params["rpn_reg"], t)            # [b, Hf, Wf, 4A]
        b = features.shape[0]
        a = cfg.num_anchors_per_cell
        obj = obj.reshape(b, -1)
        reg = reg.reshape(b, cfg.feat_size, cfg.feat_size, a, 4).reshape(b, -1, 4)
        return obj, reg

    def proposals(self, objectness, deltas, *, train: bool):
        """-> (rois [b, P, 4], roi_valid [b, P], roi_scores [b, P]);
        P = rpn_post_nms_top_n."""
        cfg = self.cfg
        anchors = self.anchors()
        k_pre = cfg.rpn_pre_nms_top_n

        def per_image(obj, dl):
            if cfg.exact_topk:
                score, idx = jax.lax.top_k(obj, k_pre)
            else:
                score, idx = jax.lax.approx_max_k(obj, k_pre)
            # gather the k_pre delta rows in the conv-native [HW, A*4] tiling
            # instead of through the flat [N, 4] view — the flat-view gather
            # relayouts the whole 2.4M-row tensor first (see rpn_loss)
            a_n = cfg.num_anchors_per_cell
            cols = (idx % a_n)[:, None] * 4 + jnp.arange(4, dtype=idx.dtype)[None, :]
            d_sel = jnp.take_along_axis(dl.reshape(-1, a_n * 4)[idx // a_n], cols, axis=1)
            boxes = box_ops.decode(d_sel, anchors[idx], RPN_BOX_WEIGHTS)
            boxes = box_ops.clip_to_image(boxes, cfg.image_size)
            # drop degenerate boxes (torchvision removes min_size < 1e-3)
            wh_ok = (boxes[:, 2] - boxes[:, 0] > 1e-3) & (boxes[:, 3] - boxes[:, 1] > 1e-3)
            score = jnp.where(wh_ok, score, NEG_INF)
            keep_idx, keep_valid = det.nms_fixed(
                boxes, score, cfg.rpn_nms_thresh, cfg.rpn_post_nms_top_n,
                fixed_depth=cfg.nms_fixed_depth)
            return boxes[keep_idx], keep_valid, score[keep_idx]

        return jax.vmap(per_image)(objectness, deltas)

    # ------------------------------------------------------------------
    def roi_features(self, params, features, rois):
        """[b, Hf, Wf, C] + [b, R, 4] -> box head embeddings [b, R, mlp]."""
        cfg = self.cfg
        pooled = det.batched_roi_align(
            features, rois, output_size=cfg.roi_output_size,
            spatial_scale=1.0 / cfg.feat_stride, sampling_ratio=cfg.roi_sampling_ratio,
        )  # [b, R, 7, 7, C]
        b, r = pooled.shape[:2]
        # match torch's NCHW flatten order for head-weight portability;
        # RoIAlign accumulates in f32 — drop back to the backbone's compute
        # dtype so the box-head MLP runs bf16 under --precision 16
        flat = jnp.transpose(pooled, (0, 1, 4, 2, 3)).reshape(b, r, -1).astype(features.dtype)
        x = jax.nn.relu(self.box_fc1.apply(params["box_fc1"], flat))
        x = jax.nn.relu(self.box_fc2.apply(params["box_fc2"], x))
        return x

    def box_predictions(self, params, embeddings):
        cls = self.cls_score.apply(params["cls_score"], embeddings)  # [b, R, K]
        reg = self.bbox_pred.apply(params["bbox_pred"], embeddings)  # [b, R, K*4]
        return cls, reg

    # ------------------------------------------------------------------
    # Training losses
    # ------------------------------------------------------------------
    def rpn_loss(self, key, objectness, deltas, gt_boxes, gt_valid):
        """Per-batch RPN losses. gt_boxes [b, G, 4] pixel xyxy."""
        cfg = self.cfg
        anchors = self.anchors()

        cells = jnp.asarray(det.base_anchors(cfg.anchor_sizes, cfg.anchor_ratios))

        def per_image(key, obj, dl, gtb, gtv):
            # grid-factored matching over all 2.4M anchors (division-free
            # threshold tests, separable per-gt max — see match_labels_grid);
            # matched-gt indices recomputed for just the sampled 256
            labels, gt_best_iou = det.match_labels_grid(
                cells, cfg.feat_size, cfg.feat_size, cfg.feat_stride,
                gtb, gtv, cfg.rpn_fg_thresh, cfg.rpn_bg_thresh,
            )
            idx, is_pos, take = det.sample_balanced(
                key, labels, cfg.rpn_batch_per_image, cfg.rpn_positive_fraction,
                approx=not cfg.exact_topk,
            )
            # Gather the sampled logits/deltas in the conv's NATIVE tiling:
            # obj/dl arrive as flat [N(,4)] views of [Hf,Wf,A(*4)] conv
            # outputs, and a row gather through the flat [N,4] view forces
            # XLA to relayout the full 2.4M-row tensor forward AND backward
            # (~70 ms of a 310 ms batch-16 train step). Reshaping back to
            # [HW, A(*4)] — free, XLA cancels it against rpn_forward's
            # reshape — and gathering rows-by-cell + take_along_axis by
            # anchor type keeps the conv tiling end to end (~9 ms;
            # scripts/probe_det_train.py dlgather vs dlgrid stages,
            # scripts/probe_scatter.py shows the scatter-add itself is cheap).
            a_n = cfg.num_anchors_per_cell
            cell = idx // a_n
            atype = idx % a_n
            w = take.astype(jnp.float32)
            o = jnp.take_along_axis(
                obj.reshape(-1, a_n)[cell], atype[:, None], axis=1)[:, 0]
            t = is_pos.astype(jnp.float32)
            obj_loss = jnp.sum(
                w * (jnp.maximum(o, 0) - o * t + jnp.log1p(jnp.exp(-jnp.abs(o))))
            ) / jnp.maximum(jnp.sum(w), 1.0)
            match_sub = det.match_subset(anchors[idx], gtb, gtv, gt_best_iou)
            matched_gt = gtb[match_sub]
            targets = box_ops.encode(matched_gt, anchors[idx], RPN_BOX_WEIGHTS)
            cols = atype[:, None] * 4 + jnp.arange(4, dtype=idx.dtype)[None, :]
            d_sel = jnp.take_along_axis(dl.reshape(-1, a_n * 4)[cell], cols, axis=1)
            pw = is_pos.astype(jnp.float32)[:, None]
            reg_loss = jnp.sum(
                pw * box_ops.smooth_l1(d_sel - targets, beta=1.0 / 9.0)
            ) / jnp.maximum(jnp.sum(w), 1.0)
            return obj_loss, reg_loss

        keys = jax.random.split(key, objectness.shape[0])
        ol, rl = jax.vmap(per_image)(keys, objectness, deltas, gt_boxes, gt_valid)
        return jnp.mean(ol), jnp.mean(rl)

    def sample_proposals(self, key, rois, roi_valid, gt_boxes, gt_valid, gt_labels):
        """Match proposals (plus appended GT) to targets and sample the ROI
        training minibatch. -> dict with rois, labels, reg_targets, masks."""
        cfg = self.cfg

        def per_image(key, r, rv, gtb, gtv, gtl):
            # append GT boxes as proposals (torchvision behavior)
            allr = jnp.concatenate([r, gtb], axis=0)
            allv = jnp.concatenate([rv, gtv], axis=0)
            iou = box_ops.pairwise_iou(allr, gtb)  # [P+G, G]
            iou = jnp.where(gtv[None, :], iou, 0.0)
            best = jnp.max(iou, axis=1)
            bidx = jnp.argmax(iou, axis=1)
            labels01 = jnp.where(best >= cfg.box_fg_thresh, 1, 0)
            labels01 = jnp.where(allv, labels01, -1)  # padding -> ignored
            idx, is_pos, take = det.sample_balanced(
                key, labels01, cfg.box_batch_per_image, cfg.box_positive_fraction
            )
            sr = allr[idx]
            sgt = gtb[bidx[idx]]
            cls_target = jnp.where(is_pos, gtl[bidx[idx]], 0)  # background = 0
            reg_target = box_ops.encode(sgt, sr, ROI_BOX_WEIGHTS)
            return sr, cls_target, reg_target, is_pos, take

        keys = jax.random.split(key, rois.shape[0])
        sr, ct, rt, ip, tk = jax.vmap(per_image)(keys, rois, roi_valid, gt_boxes, gt_valid, gt_labels)
        return {"rois": sr, "cls_target": ct, "reg_target": rt, "is_pos": ip, "take": tk}

    def roi_loss(self, params, features, sampled):
        cfg = self.cfg
        emb = self.roi_features(params, features, sampled["rois"])
        cls, reg = self.box_predictions(params, emb)
        b, r = cls.shape[:2]
        w = sampled["take"].astype(jnp.float32)
        logp = jax.nn.log_softmax(cls, axis=-1)
        onehot = jax.nn.one_hot(sampled["cls_target"], cfg.num_classes)
        cls_loss = -jnp.sum(w * jnp.sum(onehot * logp, -1)) / jnp.maximum(jnp.sum(w), 1.0)
        reg = reg.reshape(b, r, cfg.num_classes, 4)
        sel = jnp.take_along_axis(
            reg, sampled["cls_target"][..., None, None].astype(jnp.int32), axis=2
        )[:, :, 0]
        pw = sampled["is_pos"].astype(jnp.float32)[..., None]
        reg_loss = jnp.sum(pw * box_ops.smooth_l1(sel - sampled["reg_target"], beta=1.0)) / jnp.maximum(
            jnp.sum(w), 1.0
        )
        return cls_loss, reg_loss

    # ------------------------------------------------------------------
    def forward_train(self, params, features, gt_boxes, gt_valid, gt_labels, key):
        """-> dict of the four torchvision loss names."""
        k_rpn, k_roi = jax.random.split(key)
        obj, dl = self.rpn_forward(params, features)
        loss_obj, loss_rpn_reg = self.rpn_loss(k_rpn, obj, dl, gt_boxes, gt_valid)
        rois, rv, _ = self.proposals(jax.lax.stop_gradient(obj), jax.lax.stop_gradient(dl), train=True)
        sampled = self.sample_proposals(k_roi, rois, rv, gt_boxes, gt_valid, gt_labels)
        loss_cls, loss_reg = self.roi_loss(params, features, sampled)
        return {
            "loss_classifier": loss_cls,
            "loss_box_reg": loss_reg,
            "loss_objectness": loss_obj,
            "loss_rpn_box_reg": loss_rpn_reg,
        }

    def postprocess_detections(self, rois, roi_valid, scores, reg):
        """Eval post-processing chain (the torchvision
        `postprocess_detections` analogue, run per image under vmap):
        per-class box decode -> clip -> drop background -> score_thresh
        floor -> top-1000 candidate cap -> per-class NMS via coordinate
        offsetting -> top box_detections_per_img.

        rois [b, P, 4], roi_valid [b, P], scores [b, P, K] (softmaxed),
        reg [b, P, K*4] -> detections dict. Exposed as its own method so the
        chain is golden-testable on analytic inputs (tests/goldens)."""
        cfg = self.cfg

        def per_image(r, rv_, sc, rg):
            p = r.shape[0]
            k = cfg.num_classes
            rg = rg.reshape(p, k, 4)
            boxes_k = box_ops.decode(rg, r[:, None, :], ROI_BOX_WEIGHTS)
            boxes_k = box_ops.clip_to_image(boxes_k, cfg.image_size)
            # skip background class 0 (torchvision removes it)
            cand_boxes = boxes_k[:, 1:].reshape(-1, 4)
            cand_scores = jnp.where(rv_[:, None], sc[:, 1:], 0.0).reshape(-1)
            cand_labels = jnp.broadcast_to(jnp.arange(1, k)[None], (p, k - 1)).reshape(-1)
            cand_scores = jnp.where(cand_scores > cfg.box_score_thresh, cand_scores, NEG_INF)
            # cap candidates before NMS: the [K, K] suppression matrix over all
            # p*(k-1) = 8000 candidates would be 256MB; the top 1000 by score
            # always contains every survivor that matters
            n_cand = min(1000, cand_scores.shape[0])
            top_s, top_i = jax.lax.top_k(cand_scores, n_cand)
            cand_boxes = cand_boxes[top_i]
            cand_labels = cand_labels[top_i]
            cand_scores = top_s
            # batched (per-class) NMS via coordinate offsetting
            offset = cand_labels.astype(jnp.float32)[:, None] * (cfg.image_size + 2.0)
            keep_idx, keep_valid = det.nms_fixed(
                cand_boxes + offset, cand_scores, cfg.box_nms_thresh,
                cfg.box_detections_per_img, fixed_depth=cfg.nms_fixed_depth
            )
            return (
                cand_boxes[keep_idx],
                jnp.where(keep_valid, cand_scores[keep_idx], 0.0),
                cand_labels[keep_idx],
                keep_valid,
            )

        b, s, l, v = jax.vmap(per_image)(rois, roi_valid, scores, reg)
        return {"boxes": b, "scores": s, "labels": l, "valid": v}

    def forward_eval(self, params, features):
        """-> detections dict: boxes [b, D, 4] (pixel xyxy), scores [b, D],
        labels [b, D], valid [b, D]; D = box_detections_per_img."""
        obj, dl = self.rpn_forward(params, features)
        rois, rv, _ = self.proposals(obj, dl, train=False)
        emb = self.roi_features(params, features, rois)
        cls, reg = self.box_predictions(params, emb)
        scores = jax.nn.softmax(cls, axis=-1)
        return self.postprocess_detections(rois, rv, scores, reg)

    def forward_diag(self, params, features):
        """Stage-wise eval tap for validation diagnostics (VERDICT r3 item
        1a): exposes the post-NMS RPN proposals and the per-proposal class
        posteriors so the host can localize a zero ATS to a stage — RPN
        recall, proposal coverage, or classifier accuracy — instead of
        seeing only the end-to-end metric."""
        obj, dl = self.rpn_forward(params, features)
        rois, rv, _ = self.proposals(obj, dl, train=False)
        emb = self.roi_features(params, features, rois)
        cls, _ = self.box_predictions(params, emb)
        return {"rois": rois, "roi_valid": rv, "cls": jax.nn.softmax(cls, axis=-1)}
