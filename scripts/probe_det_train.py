"""Stage-bisected detection TRAIN step cost (the zoo's slowest family).

Cumulative stages, each a full fwd+bwd+adam step on device-resident data:
  backbone   trunk fwd+bwd only (loss = mean(feats^2))
  +rpn       + rpn_forward + rpn_loss (anchor matching + balanced sample)
  +proposals + proposal NMS + ROI sampling (both under stop_gradient)
  full       + roi_align + box head losses (= the real train step)

    python scripts/probe_det_train.py [--batch 16] [--frozen]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--frozen", action="store_true",
                    help="freeze the encoder (static stop_gradient partition)")
    ap.add_argument("--stages", type=str, default="backbone,rpn,proposals,full")
    ap.add_argument("--remat", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    enable_compilation_cache()
    rng0 = np.random.RandomState(0)
    B = args.batch
    batch = {
        "images": jnp.asarray(rng0.rand(B, 6, 256, 306, 3).astype(np.float32)),
        "road": jnp.asarray((rng0.rand(B, 800, 800) > 0.5).astype(np.float32)),
        "boxes": jnp.asarray(rng0.rand(B, 100, 2, 4).astype(np.float32) * 20),
        "box_valid": jnp.asarray(rng0.rand(B, 100) > 0.7),
        "categories": jnp.asarray(rng0.randint(0, 9, (B, 100)), dtype=jnp.int32),
    }
    task = FasterRCNNRoadMap(dict(pretrained_path=None, ae_hidden_dim=128,
                                  ae_latent_dim=64, batch_size=B, precision=16,
                                  unfreeze_epoch_no=1000, remat=bool(args.remat)))
    params, state = task.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-4)
    static_mask = task.freeze_mask(params, 0) if args.frozen else None

    def staged_loss(stage):
        head = task.head

        def loss_fn(p, st, bt, rng):
            k_bb, k_det = jax.random.split(rng)
            feats, ns = task.backbone_features(
                p, st, bt["images"], bt.get("road"), train=True, rng=k_bb)
            if stage == "backbone":
                return jnp.mean(feats.astype(jnp.float32) ** 2), ns
            gt_boxes, gt_valid, gt_labels = task._targets(bt)
            k_rpn, k_roi = jax.random.split(k_det)
            obj, dl = head.rpn_forward(p["head"], feats)
            if stage == "rpnconv":
                return jnp.mean(obj ** 2) + jnp.mean(dl ** 2), ns
            if stage in ("match", "sample", "objloss", "subset", "dlgather",
                         "dlsg", "dldense", "dlgrid"):
                from driving_dirty_tpu.ops import detection as det
                from driving_dirty_tpu.ops import boxes as box_ops
                from driving_dirty_tpu.nn.detection import RPN_BOX_WEIGHTS
                cfg = head.cfg
                cells = jnp.asarray(det.base_anchors(cfg.anchor_sizes, cfg.anchor_ratios))
                anchors = head.anchors()

                def per_image(key, o, d, gtb, gtv):
                    labels, gt_best = det.match_labels_grid(
                        cells, cfg.feat_size, cfg.feat_size, cfg.feat_stride,
                        gtb, gtv, cfg.rpn_fg_thresh, cfg.rpn_bg_thresh)
                    if stage == "match":
                        return jnp.sum(labels) + jnp.sum(gt_best)
                    idx, is_pos, take = det.sample_balanced(
                        key, labels, cfg.rpn_batch_per_image,
                        cfg.rpn_positive_fraction, approx=not cfg.exact_topk)
                    if stage == "sample":
                        # gather-free digest: a flat-view o[idx] here would
                        # add the relayouted gather+scatter the real rpn_loss
                        # deliberately avoids (see dlgrid), misattributing
                        # ~28 ms to sampling
                        return jnp.sum(idx * take) + jnp.sum(is_pos)
                    w = take.astype(jnp.float32)
                    oo = o[idx]
                    t = is_pos.astype(jnp.float32)
                    obj_loss = jnp.sum(
                        w * (jnp.maximum(oo, 0) - oo * t
                             + jnp.log1p(jnp.exp(-jnp.abs(oo))))
                    ) / jnp.maximum(jnp.sum(w), 1.0)
                    if stage == "objloss":
                        return obj_loss
                    if stage == "dlgather":
                        return obj_loss + 1e-20 * jnp.sum(d[idx])
                    if stage == "dlsg":
                        # forward-only gather: is the cost in the gather or
                        # in d's backward once idx touches it?
                        return obj_loss + 1e-20 * jnp.sum(
                            jax.lax.stop_gradient(d)[idx])
                    if stage == "dlgrid":
                        # conv-native-layout gather: rows of [HW, A*4] by cell,
                        # then the per-row anchor-type 4-slice. The [N, 4] view
                        # tiles incompatibly with the conv's [HW, 60] output,
                        # so d[idx] forces full relayouts fwd AND bwd; this
                        # form gathers/scatters in the conv's own tiling.
                        a_n = d.shape[0] // (cfg.feat_size * cfg.feat_size)
                        dgrid = d.reshape(cfg.feat_size * cfg.feat_size, a_n * 4)
                        cell = idx // a_n
                        atype = idx % a_n
                        rows = dgrid[cell]                       # [S, A*4]
                        cols = atype[:, None] * 4 + jnp.arange(4)[None, :]
                        sub = jnp.take_along_axis(rows, cols, axis=1)
                        return obj_loss + 1e-20 * jnp.sum(sub)
                    if stage == "dldense":
                        # gather-free: dense 0/1 row mask (no grad through the
                        # scatter), reduce fuses with the conv epilogue
                        wd = jnp.zeros((d.shape[0],), jnp.float32).at[idx].add(
                            jax.lax.stop_gradient(w))
                        return obj_loss + 1e-20 * jnp.sum(d * wd[:, None])
                    match_sub = det.match_subset(anchors[idx], gtb, gtv, gt_best)
                    targets = box_ops.encode(gtb[match_sub], anchors[idx], RPN_BOX_WEIGHTS)
                    return obj_loss + 1e-20 * jnp.sum(targets)

                keys = jax.random.split(k_rpn, obj.shape[0])
                v = jax.vmap(per_image)(keys, obj, dl, gt_boxes, gt_valid)
                # 1e-20 (not 0.0) so XLA cannot constant-fold the stage away
                return jnp.mean(obj ** 2) + jnp.mean(dl ** 2) + 1e-20 * jnp.sum(
                    v.astype(jnp.float32)), ns
            loss_obj, loss_rpn_reg = head.rpn_loss(k_rpn, obj, dl, gt_boxes, gt_valid)
            if stage == "rpn":
                return loss_obj + loss_rpn_reg, ns
            rois, rv, _ = head.proposals(
                jax.lax.stop_gradient(obj), jax.lax.stop_gradient(dl), train=True)
            sampled = head.sample_proposals(k_roi, rois, rv, gt_boxes, gt_valid, gt_labels)
            if stage == "proposals":
                return loss_obj + loss_rpn_reg + jnp.mean(sampled["rois"]) * 0.0, ns
            if stage in ("alignfwd", "alignbwd"):
                from driving_dirty_tpu.ops import detection as det
                cfg = head.cfg
                f_in = (jax.lax.stop_gradient(feats) if stage == "alignfwd"
                        else feats)
                pooled = det.batched_roi_align(
                    f_in, sampled["rois"], output_size=cfg.roi_output_size,
                    spatial_scale=1.0 / cfg.feat_stride,
                    sampling_ratio=cfg.roi_sampling_ratio)
                return (loss_obj + loss_rpn_reg
                        + 1e-20 * jnp.sum(pooled.astype(jnp.float32))), ns
            loss_cls, loss_reg = head.roi_loss(p["head"], feats, sampled)
            return loss_obj + loss_rpn_reg + loss_cls + loss_reg, ns

        return loss_fn

    def bench(stage):
        lf = staged_loss(stage)

        @jax.jit
        def step(params, opt_state, st, bt, rng):
            def wrapped(p):
                if static_mask is not None:
                    p = jax.tree.map(lambda l, m: l if m else jax.lax.stop_gradient(l),
                                     p, static_mask)
                loss, ns = lf(p, st, bt, rng)
                return loss, ns

            (loss, ns), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, ns, loss

        p = jax.tree.map(jnp.asarray, params)
        s = jax.tree.map(jnp.asarray, state)
        opt_state = tx.init(p)
        rngs = jax.random.split(jax.random.PRNGKey(1), args.iters + 2)
        for i in range(2):
            p, opt_state, s, loss = step(p, opt_state, s, batch, rngs[i])
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            p, opt_state, s, loss = step(p, opt_state, s, batch, rngs[2 + i])
        float(loss)
        dt = (time.perf_counter() - t0) / args.iters
        tag = "frozen" if args.frozen else "unfrozen"
        print(f"{stage:10s} [{tag}]: {dt*1e3:8.2f} ms/step  {B/dt:8.1f} scenes/s  (batch {B})",
              flush=True)

    for stage in args.stages.split(","):
        bench(stage)


if __name__ == "__main__":
    main()
