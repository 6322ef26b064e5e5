"""Faster-RCNN bounding-box tasks.

Re-designs of /root/reference/src/bounding_box_model/fast_rcnn/
{bb_fast_rcnn,bb_fast_rcnn_w_map}.py (SURVEY.md §2.7):

  BBFasterRCNN      ("faster_rcnn"): six views -> square BEV-layout image
                    (ops.maps.layout_images_as_map) -> frozen SSL encoder c3
                    backbone -> RPN + ROI heads (nn.detection), 9 classes.
  FasterRCNNRoadMap ("faster_rcnn_rm", the registry default submit.py:25):
                    additionally fuses the GT road map as a 4th channel
                    through mapper_cnn Conv(4->3) + sigmoid before the
                    backbone (bb_fast_rcnn_w_map.py:71,237-245).

Box targets: meter-space [N, 2, 4] corners -> pixel AABB [x0, y0, x1, y1] via
ops.coords.corners_to_aabb (the reference's _old_to_new_coord). Labels are raw
category ids as the reference feeds them.

Validation: the reference returns `val_loss = -current_epoch` so Lightning's
min-val_loss checkpointing keeps the latest epoch (bb_fast_rcnn_w_map.py:278
— a hack). Our Trainer always keeps last.ckpt, so validation here reports the
real eval-mode losses instead; keep-latest behavior is preserved by design.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from driving_dirty_tpu.models.labeled_data import LabeledDataMixin, add_labeled_data_args
from driving_dirty_tpu.models.pretrained import Int8TrunkMixin, init_backbone, load_pretrained_ae
from driving_dirty_tpu.nn.detection import DetectionConfig, FasterRCNNHead
from driving_dirty_tpu.core import layers as L
from driving_dirty_tpu.ops.coords import corners_to_aabb
from driving_dirty_tpu.ops.maps import layout_images_as_map
from driving_dirty_tpu.train.task import Task, hp, hp_opt


class BBFasterRCNN(Int8TrunkMixin, LabeledDataMixin, Task):
    name = "faster_rcnn"
    uses_roadmap = False

    def __init__(self, hparams=None):
        super().__init__(hparams)
        h = self.hparams
        self.batch_size = hp(h, "batch_size", 6)
        self.unfreeze_epoch_no = hp(h, "unfreeze_epoch_no", 10) or 10
        self.ae, self._ae_params, self._ae_state = load_pretrained_ae(h)
        sizes = hp(h, "anchor_sizes", (32, 64, 128, 256, 512))
        if isinstance(sizes, str):
            sizes = tuple(int(s) for s in sizes.split(","))
        ratios = hp(h, "anchor_ratios", (0.5, 1.0, 2.0))
        if isinstance(ratios, str):
            ratios = tuple(float(s) for s in ratios.split(","))
        dil = hp(h, "rpn_head_dilations", ()) or ()
        if isinstance(dil, str):
            dil = tuple(int(s) for s in dil.split(",") if s)
        self.cfg = DetectionConfig(
            image_size=hp(h, "image_size", 800),
            # default = torchvision's AnchorGenerator sizes the reference
            # uses (bb_fast_rcnn.py:61-62); tunable because anchor/object
            # scale match is a first-order detection-quality knob — types
            # with no labeled examples at object locations suffer score
            # inflation through the shared RPN feature (see
            # scripts/probe_det_learn.py + data/synthetic.py box sampling)
            anchor_sizes=tuple(sizes),
            anchor_ratios=tuple(ratios),
            rpn_head_dilations=tuple(dil),
            rpn_head_norm=bool(hp(h, "rpn_head_norm", False)),
            rpn_pre_nms_top_n=hp(h, "rpn_pre_nms_top_n", 2000),
            rpn_post_nms_top_n=hp(h, "rpn_post_nms_top_n", 1000),
            exact_topk=bool(hp(h, "exact_topk", False)),
            box_batch_per_image=hp(h, "box_batch_per_image", 512),
            # --label_offset 1 = torchvision's actual convention (background
            # 0, classes 1..9): the reference feeds RAW category ids where
            # class 0 collides with background (bb_fast_rcnn.py:69,172-188)
            # — a category-0 GT box is undetectable by design. Default 0
            # keeps reference parity; the offset grows the classifier by
            # `offset` classes and shifts labels in/out at the task boundary
            # (measured A/B: artifacts/det_label_offset_ab.json).
            num_classes=9 + hp(h, "label_offset", 0),
            nms_fixed_depth=hp(h, "nms_fixed_depth", 0),
        )
        self.label_offset = hp(h, "label_offset", 0)
        self.head = FasterRCNNHead(self.cfg)
        # Cold-start de-risking (VERDICT r4 item 4, measured in
        # artifacts/approx_exact_ab.json): from-scratch takeoff is
        # path-sensitive to approx_max_k's ~0.95-recall proposal selection —
        # one A/B arm stalled entirely where the exact arm took off. Exact
        # top-k costs 28 vs 3.4 ms per 8 images, so running it ONLY for the
        # first K optimizer steps buys deterministic early proposal coverage
        # for ~zero steady-state cost. Same param pytree (cfg change is
        # compute-only); the trainer specializes one extra program via
        # step_variant(). 0 disables; irrelevant when exact_topk is on.
        self.exact_topk_warmup_steps = hp(h, "exact_topk_warmup_steps", 500)
        self._warmup_head = (
            FasterRCNNHead(dataclasses.replace(self.cfg, exact_topk=True))
            if self.exact_topk_warmup_steps and not self.cfg.exact_topk
            else None
        )
        self._active_head = self.head
        if self.uses_roadmap:
            self.mapper_cnn = L.Conv2d(4, 3, 3, 1, 1)

    def step_variant(self, global_step: int):
        """Trainer hook: hashable key of the compiled-step variant active at
        this optimizer step; also swaps the head the next trace will use."""
        if self._warmup_head is not None and global_step < self.exact_topk_warmup_steps:
            self._active_head = self._warmup_head
            return "exact_topk_warmup"
        self._active_head = self.head
        return None

    # --- model -----------------------------------------------------------
    def init(self, rng):
        k_bb, k_head, k_map = jax.random.split(rng, 3)
        # c3_only: the detection backbone taps the conv feature map and never
        # evaluates the encoder's 120M-param dense path — drop it from the
        # task's param tree (models/pretrained.init_backbone)
        bb_p, bb_s = init_backbone(self.ae, self._ae_params, self._ae_state,
                                   k_bb, c3_only=True)
        params = {"encoder": bb_p["encoder"], "head": self.head.init(k_head)}
        if self.uses_roadmap:
            params["mapper_cnn"] = self.mapper_cnn.init(k_map)
        return params, {"encoder": bb_s["encoder"]}

    def _backbone_input(self, params, images, road):
        """Six views -> square layout image (+ roadmap fusion) = the conv
        trunk's input. Shared by the forward path and int8 calibration."""
        from driving_dirty_tpu.ops.stitch import normalize_images

        square = layout_images_as_map(
            normalize_images(images, self.compute_dtype), size=self.cfg.image_size
        )  # [b, S, S, 3]
        if self.uses_roadmap:
            x = jnp.concatenate(
                [square, road[..., None].astype(self.compute_dtype)], axis=-1
            )
            x = jax.nn.sigmoid(self.mapper_cnn.apply(params["mapper_cnn"], x))
        else:
            x = square
        return x

    def calibrate_int8(self, params, state, images, road=None):
        """One-time static activation-scale calibration for the c3 trunk
        (--precision 8). Must run EAGERLY before tracing the eval fn — see
        RoadMapBase.calibrate_int8."""
        if not self.int8_trunk or self._int8_scales is not None:
            return
        x = self._backbone_input(
            params, jnp.asarray(images),
            None if road is None else jnp.asarray(road),
        )
        self.calibrate_int8_on(params["encoder"], x)

    def backbone_features(self, params, state, images, road, *, train: bool, rng):
        """Six views -> square layout -> (fused) -> frozen encoder c3 features."""
        x = self._backbone_input(params, images, road)
        enc_apply = lambda p, s, v: self.ae.encoder.apply(
            p, s, v, train=train, rng=rng, c3_only=True,
            fast=(not train) and hp(self.hparams, "fast_conv", False),
            **self.enc_int8_kwargs(train),
        )
        if train and hp_opt(self.hparams, "remat", False):
            # off by default: storing the 800x800 trunk's c1/c2 activations
            # fits HBM now that the RoIAlign temps are bin-level bf16
            # (batch 16: 73.5 -> 82.1 scenes/s; batch 32 fits too), and the
            # backward skips a full trunk recompute. --remat 1 restores the
            # low-memory behavior for larger configs.
            enc_apply = jax.checkpoint(enc_apply)
        # the c3-only backbone is stateless (no BN on the conv trunk) — a
        # checkpoint round-trips its empty state tree as None, so tolerate it
        enc_state = (state or {}).get("encoder", {})
        feats, se = enc_apply(params["encoder"], enc_state, x)
        return feats, {"encoder": se}

    def _targets(self, batch):
        gt_boxes = corners_to_aabb(batch["boxes"])  # [b, G, 4] pixel xyxy
        cats = batch["categories"].astype(jnp.int32) + self.label_offset
        return gt_boxes, batch["box_valid"], cats

    def loss(self, params, state, batch, rng, *, train: bool):
        k_bb, k_det = jax.random.split(rng)
        feats, new_state = self.backbone_features(
            params, state, batch["images"], batch.get("road"), train=train, rng=k_bb
        )
        gt_boxes, gt_valid, gt_labels = self._targets(batch)
        losses = self._active_head.forward_train(
            params["head"], feats, gt_boxes, gt_valid, gt_labels, k_det
        )
        total = sum(losses.values())
        return total, (new_state, losses)

    predict_chunk = 8  # bound NMS temps: the greedy NMS holds a [2000,2000]
    # IoU matrix per image and the class-wise second stage multiplies that by
    # 9 classes — an unchunked batch-32 eval program needs >20GB of HBM temps
    # (measured compile OOM); lax.map over sub-batches caps residency.

    def predict(self, params, state, images, road=None, rng=None):
        """-> detections dict (pixel xyxy boxes, scores, labels, valid)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng

        def run(im, rd):
            feats, _ = self.backbone_features(params, state, im, rd, train=False, rng=rng)
            dets = self.head.forward_eval(params["head"], feats)
            if self.label_offset:
                # report RAW dataset category ids to consumers
                dets = dict(dets, labels=dets["labels"] - self.label_offset)
            return dets

        b = images.shape[0]
        ch = self.predict_chunk
        if b <= ch:
            return run(images, road)
        # pad the tail to a chunk multiple instead of falling back to one
        # unchunked program (whose NMS temps scale with the full batch)
        pad = (-b) % ch
        if pad:
            images = jnp.concatenate([images, jnp.zeros((pad, *images.shape[1:]), images.dtype)])
            if road is not None:
                road = jnp.concatenate([road, jnp.zeros((pad, *road.shape[1:]), road.dtype)])
        n = b + pad
        ims = images.reshape(n // ch, ch, *images.shape[1:])
        rds = (
            road.reshape(n // ch, ch, *road.shape[1:])
            if road is not None
            else jnp.zeros((n // ch, ch, 0))
        )
        out = jax.lax.map(lambda xr: run(xr[0], xr[1] if road is not None else None), (ims, rds))
        return jax.tree.map(lambda x: x.reshape(n, *x.shape[2:])[:b], out)

    # --- validation metrics ----------------------------------------------
    _host_predict = None

    def host_val_metrics(self, params, state, batch, bmask):
        """`val_ats`: the official box threat score over this val batch.

        Completes the metric the reference imports into its val step but
        leaves commented out (/root/reference/src/bounding_box_model/
        fast_rcnn/bb_fast_rcnn_w_map.py:139-154): jitted fixed-shape detection
        inference on device, then pixel AABB -> meter corners
        (ops.coords.aabb_to_corners) and the host-side polygon-IoU ATS.
        Called by the Trainer's validation loop per batch; disable with
        --val_ats 0 if val wall-time matters."""
        if not hp(self.hparams, "val_ats", True):
            return {}
        import numpy as np
        from driving_dirty_tpu.metrics.threat import ats_bounding_boxes
        from driving_dirty_tpu.ops.coords import aabb_to_corners

        if self._host_predict is None:
            if self.uses_roadmap:
                self._host_predict = jax.jit(
                    lambda p, s, im, rd: self.predict(p, s, im, rd)
                )
            else:
                self._host_predict = jax.jit(
                    lambda p, s, im, rd: self.predict(p, s, im, None)
                )
        dets = self._host_predict(params, state, batch["images"], batch.get("road"))
        boxes_m = np.asarray(aabb_to_corners(dets["boxes"]))  # [b, D, 2, 4]
        # default = the eval pipeline's own score floor (box_score_thresh
        # 0.05), so val_ats scores every detection forward_eval returns —
        # matching the reference's commented-out all-detections ATS intent
        # (bb_fast_rcnn_w_map.py:139-154). Raise it to score only confident
        # detections.
        thr = hp(self.hparams, "val_ats_score_thresh", self.cfg.box_score_thresh)
        valid = np.asarray(dets["valid"]) & (np.asarray(dets["scores"]) > thr)
        gt = np.asarray(batch["boxes"])
        gtv = np.asarray(batch["box_valid"])
        scores = []
        for j in range(min(len(bmask), len(gt))):
            if not bmask[j]:
                continue
            gt_j = gt[j][gtv[j]]
            if len(gt_j) == 0:
                continue
            scores.append(float(ats_bounding_boxes(boxes_m[j][valid[j]], gt_j)))
        # (value, weight): the mean covers only images with GT boxes, so the
        # trainer must weight this batch by that count — not the batch size
        out = {"val_ats": (float(np.mean(scores)), float(len(scores)))} if scores else {}
        # detections clearing the score floor, per val image (weight = images)
        n_imgs = int(np.sum(bmask[: len(gt)]))
        if n_imgs:
            out["val_det_kept"] = (float(valid[: len(bmask)][bmask].sum(1).mean()),
                                   float(n_imgs))
        if hp(self.hparams, "val_diag", True):
            out.update(self._stage_diagnostics(params, state, batch, bmask))
        return out

    _host_diag = None

    def _stage_diagnostics(self, params, state, batch, bmask):
        """Stage-wise detection diagnostics (VERDICT r3 item 1a), logged per
        epoch so a zero val_ats localizes to a pipeline stage:

          val_rpn_recall — fraction of GT boxes matched (axis-aligned
                           IoU >= 0.5) by some valid post-NMS proposal;
          val_prop_cov   — mean over GT of the best proposal IoU;
          val_cls_acc    — on each GT's best-matching proposal (IoU >= 0.5),
                           argmax class posterior == the GT's label.

        All weights are GT-box counts, matching the trainer's per-key
        weighted host-hook aggregation."""
        import numpy as np

        if self._host_diag is None:

            def diag(p, s, im, rd):
                feats, _ = self.backbone_features(
                    p, s, im, rd if self.uses_roadmap else None,
                    train=False, rng=jax.random.PRNGKey(0),
                )
                return self.head.forward_diag(p["head"], feats)

            self._host_diag = jax.jit(diag)

        d = self._host_diag(params, state, batch["images"], batch.get("road"))
        rois = np.asarray(d["rois"], np.float32)        # [b, P, 4]
        rv = np.asarray(d["roi_valid"])                 # [b, P]
        cls = np.asarray(d["cls"], np.float32)          # [b, P, K]
        gtb = np.asarray(corners_to_aabb(batch["boxes"]), np.float32)
        gtv = np.asarray(batch["box_valid"])
        # compare in the classifier's label space (shifted when label_offset)
        gtl = np.asarray(batch["categories"]) + self.label_offset
        rec, cov, acc = [], [], []
        for j in range(min(len(bmask), len(gtb))):
            if not bmask[j] or not gtv[j].any():
                continue
            g = gtb[j][gtv[j]]                          # [G, 4]
            r = rois[j][rv[j]]                          # [V, 4]
            labels = gtl[j][gtv[j]]
            if len(r) == 0:
                rec += [0.0] * len(g)
                cov += [0.0] * len(g)
                continue
            # axis-aligned IoU [V, G]
            x0 = np.maximum(r[:, None, 0], g[None, :, 0])
            y0 = np.maximum(r[:, None, 1], g[None, :, 1])
            x1 = np.minimum(r[:, None, 2], g[None, :, 2])
            y1 = np.minimum(r[:, None, 3], g[None, :, 3])
            inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
            area_r = (r[:, 2] - r[:, 0]) * (r[:, 3] - r[:, 1])
            area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
            iou = inter / np.maximum(area_r[:, None] + area_g[None, :] - inter, 1e-9)
            best = iou.max(0)                           # [G]
            bidx = iou.argmax(0)
            rec += list((best >= 0.5).astype(np.float64))
            cov += list(best.astype(np.float64))
            pred = cls[j][rv[j]][bidx].argmax(-1)       # [G]
            for gi in range(len(g)):
                if best[gi] >= 0.5:
                    acc.append(float(pred[gi] == labels[gi]))
        out = {}
        if rec:
            out["val_rpn_recall"] = (float(np.mean(rec)), float(len(rec)))
            out["val_prop_cov"] = (float(np.mean(cov)), float(len(cov)))
        if acc:
            out["val_cls_acc"] = (float(np.mean(acc)), float(len(acc)))
        return out

    # --- optimization ----------------------------------------------------
    def learning_rate(self):
        return hp(self.hparams, "learning_rate", 1e-3)

    def freeze_mask(self, params, epoch: int):
        if epoch >= self.unfreeze_epoch_no:
            return None
        enc_frozen = jax.tree.map(lambda _: False, params["encoder"])
        rest = {k: jax.tree.map(lambda _: True, v) for k, v in params.items() if k != "encoder"}
        return {"encoder": enc_frozen, **rest}

    # --- CLI -------------------------------------------------------------
    @staticmethod
    def add_model_specific_args(parser):
        from driving_dirty_tpu.cli.hyperopt import opt_list

        opt_list(parser, "--learning_rate", type=float, default=1e-3,
                 options=[1e-3, 1e-4, 1e-5], tunable=True)
        parser.add_argument("--batch_size", type=int, default=6)
        parser.add_argument("--unfreeze_epoch_no", type=int, default=10)
        parser.add_argument("--max_bb", type=int, default=100)
        parser.add_argument("--anchor_sizes", type=str, default="32,64,128,256,512",
                            help="comma-separated anchor sizes (px); the default "
                                 "is the reference's torchvision config")
        parser.add_argument("--anchor_ratios", type=str, default="0.5,1.0,2.0",
                            help="comma-separated anchor aspect ratios")
        parser.add_argument("--rpn_head_dilations", type=str, default="",
                            help="comma-separated dilations for extra RPN-head "
                                 "3x3 convs (e.g. '4,8,16,32'). Empty (default) "
                                 "= torchvision-parity single-conv head. The "
                                 "reference backbone's ~7 px receptive field is "
                                 "far below its anchor sizes; this expands the "
                                 "RPN head's RF so objectness can localize "
                                 "(see nn/detection.DetectionConfig)")
        parser.add_argument("--rpn_head_norm", type=int, default=0, choices=[0, 1],
                            help="per-cell RMS norm in the RPN head (bounds "
                                 "padding-artifact score scales; 0 = parity)")
        parser.add_argument("--rpn_pre_nms_top_n", type=int, default=2000)
        parser.add_argument("--exact_topk", type=int, default=0, choices=[0, 1],
                            help="exact lax.top_k proposal selection instead of "
                                 "TPU approx_max_k (slower; bitwise torchvision-style)")
        parser.add_argument("--exact_topk_warmup_steps", type=int, default=500,
                            help="use exact top-k proposal selection for the "
                                 "first N optimizer steps (cold-start takeoff "
                                 "de-risking; 0 disables)")
        parser.add_argument("--nms_fixed_depth", type=int, default=0,
                            help="N > 0: straight-line NMS with N suppression "
                                 "applications instead of the convergence "
                                 "while-loop (eval speed knob; exact for "
                                 "dependency chains < N)")
        parser.add_argument("--label_offset", type=int, default=0,
                            help="shift category ids by N for the classifier "
                                 "(1 = torchvision convention: background=0, "
                                 "classes 1..9; default 0 = reference parity "
                                 "incl. the category-0/background collision)")
        parser.add_argument("--rpn_post_nms_top_n", type=int, default=1000)
        parser.add_argument("--box_batch_per_image", type=int, default=512)
        parser.add_argument("--mse_loss", action="store_true", default=False)
        parser.add_argument("--val_ats", type=int, default=1, choices=[0, 1],
                            help="compute the box threat score (val_ats) during validation")
        parser.add_argument("--val_diag", type=int, default=1, choices=[0, 1],
                            help="log stage-wise detection diagnostics "
                                 "(val_rpn_recall, val_prop_cov, val_cls_acc) "
                                 "each validation epoch")
        parser.add_argument("--val_ats_score_thresh", type=float, default=0.05,
                            help="score floor for detections entering val_ats; "
                                 "default = the eval pipeline's box_score_thresh "
                                 "so every returned detection is scored")
        add_labeled_data_args(parser)
        return parser


class FasterRCNNRoadMap(BBFasterRCNN):
    """faster_rcnn_rm: + GT roadmap fused as a 4th input channel
    (bb_fast_rcnn_w_map.py:71,237-245)."""

    name = "faster_rcnn_rm"
    uses_roadmap = True

    @staticmethod
    def add_model_specific_args(parser):
        from driving_dirty_tpu.cli.hyperopt import tune

        BBFasterRCNN.add_model_specific_args(parser)
        # reference CLI defaults differ: output_img_freq 100 (bb_fast_rcnn_w_map.py:353)
        parser.set_defaults(output_img_freq=100)
        tune(parser, "unfreeze_epoch_no", [0, 10])
        return parser
