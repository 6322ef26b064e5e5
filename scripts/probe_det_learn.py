"""Instrumented detection-learning probe (VERDICT r3 item 1 diagnosis).

Trains FasterRCNNRoadMap on the painted-box gate dataset for N steps on the
real TPU, evaluating a fixed val batch every `--every` steps with STAGE-WISE
internals the gate can't see:

  * rpn_auc    — ranking quality of objectness over positive vs negative
                 anchors (labels from the matcher itself): can the RPN
                 score separate them at all?
  * pos_in_topk— fraction of positive anchors inside the pre-NMS top-k
                 selection (the stage where good anchors must survive);
  * d_mag      — mean |deltas| on positive anchors (regression blow-up
                 detector);
  * recall/cov — post-NMS proposal recall@0.5 / mean best-IoU per GT;
  * ats        — end metric on the val batch.

    python scripts/probe_det_learn.py --steps 200 --lr 1e-3 [--precision 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/dd_gate_tpu")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--every", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--precision", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--anchors", default="44")
    ap.add_argument("--paint_scale", default="44,44")
    ap.add_argument("--ratios", default="1.0")
    ap.add_argument("--norm", type=int, default=1)
    ap.add_argument("--rpn_dil", default="4,8,16",
                    help="rpn_head_dilations; '' for the parity head")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.data.synthetic import generate
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap
    from driving_dirty_tpu.ops import detection as det
    from driving_dirty_tpu.ops.coords import corners_to_aabb

    enable_compilation_cache()
    if not os.path.isdir(args.data):
        generate(args.data, scenes=args.scenes, samples=args.samples,
                 labeled_scenes=args.scenes, seed=0, structured=True,
                 paint_boxes=True, road_from_tint=True, road_noise=(0.2, 0.01),
                 paint_scale=tuple(float(s) for s in args.paint_scale.split(",")))

    task = FasterRCNNRoadMap(dict(
        pretrained_path=None, batch_size=args.batch, learning_rate=args.lr,
        precision=args.precision, unfreeze_epoch_no=0, max_bb=16,
        anchor_sizes=tuple(int(s) for s in args.anchors.split(",")),
        anchor_ratios=tuple(float(s) for s in args.ratios.split(",")),
        rpn_head_dilations=args.rpn_dil,
        rpn_head_norm=args.norm,
        num_labeled_scenes=args.scenes, link=args.data,
        samples_per_scene=args.samples, output_img_freq=0))
    task.current_epoch = 0
    params, state = task.init(jax.random.PRNGKey(0))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    loader = task.train_loader()
    batches = [jax.tree.map(jnp.asarray, b) for b, _ in zip(
        (b for b, _m in iter(loader)), range(10 ** 9))]
    print(f"{len(batches)} train batches", flush=True)
    vb = next(iter(task.val_loader()))[0]
    vb = jax.tree.map(jnp.asarray, vb)

    @jax.jit
    def step(params, opt_state, state, batch, rng):
        def loss_fn(p):
            loss, (ns, aux) = task.loss(p, state, batch, rng, train=True)
            return loss, (ns, aux)

        (loss, (ns, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state2, ns, loss, aux

    cfg = task.cfg

    @jax.jit
    def diag(params, state, batch):
        feats, _ = task.backbone_features(
            params, state, batch["images"], batch["road"],
            train=False, rng=jax.random.PRNGKey(0))
        head = task.head
        obj, dl = head.rpn_forward(params["head"], feats)
        rois, rv, _ = head.proposals(obj, dl, train=False)
        gtb = corners_to_aabb(batch["boxes"])
        cells = jnp.asarray(det.base_anchors(cfg.anchor_sizes, cfg.anchor_ratios))

        def per_image(o, d, g, gv):
            labels, _ = det.match_labels_grid(
                cells, cfg.feat_size, cfg.feat_size, cfg.feat_stride,
                g, gv, cfg.rpn_fg_thresh, cfg.rpn_bg_thresh)
            pos = labels == 1
            neg = labels == 0
            # AUC via normalized rank statistic of positive scores among all
            r = jnp.argsort(jnp.argsort(o))  # dense ranks
            n_pos = jnp.sum(pos)
            n_neg = jnp.sum(neg)
            auc = (jnp.sum(jnp.where(pos, r, 0)) / jnp.maximum(n_pos, 1)
                   - (o.shape[0] + 1) / 2.0) / jnp.maximum(n_neg, 1) + 0.5
            _, topk = jax.lax.top_k(o, cfg.rpn_pre_nms_top_n)
            pos_top = jnp.sum(pos[topk]) / jnp.maximum(n_pos, 1)
            a_n = cells.shape[0]
            cols = (topk % a_n)[:, None] * 4 + jnp.arange(4)[None, :]
            d_sel = jnp.take_along_axis(
                d.reshape(-1, a_n * 4)[topk // a_n], cols, axis=1)
            return auc, pos_top, jnp.mean(jnp.abs(d_sel)), n_pos

        auc, pos_top, dmag, n_pos = jax.vmap(per_image)(
            obj.astype(jnp.float32), dl.astype(jnp.float32), gtb, batch["box_valid"])
        return {"rois": rois, "rv": rv, "auc": auc, "pos_top": pos_top,
                "dmag": dmag, "n_pos": n_pos, "gtb": gtb}

    def host_diag(params, state, tag):
        d = jax.tree.map(np.asarray, diag(params, state, vb))
        gtv = np.asarray(vb["box_valid"])
        recs, covs = [], []
        for j in range(len(gtv)):
            g = d["gtb"][j][gtv[j]]
            r = d["rois"][j][d["rv"][j]]
            if len(g) == 0:
                continue
            x0 = np.maximum(r[:, None, 0], g[None, :, 0])
            y0 = np.maximum(r[:, None, 1], g[None, :, 1])
            x1 = np.minimum(r[:, None, 2], g[None, :, 2])
            y1 = np.minimum(r[:, None, 3], g[None, :, 3])
            inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
            ar = (r[:, 2] - r[:, 0]) * (r[:, 3] - r[:, 1])
            ag = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
            iou = inter / np.maximum(ar[:, None] + ag[None, :] - inter, 1e-9)
            best = iou.max(0) if len(r) else np.zeros(len(g))
            recs += list(best >= 0.5)
            covs += list(best)
        m = task.host_val_metrics(params, state, vb, np.ones(len(gtv), bool))
        ats = m.get("val_ats", (0.0, 0))[0]
        print(f"{tag}: auc={d['auc'].mean():.3f} pos_in_top2000={d['pos_top'].mean():.3f} "
              f"|d|={d['dmag'].mean():.3f} n_pos={d['n_pos'].mean():.0f} "
              f"recall={np.mean(recs):.3f} cov={np.mean(covs):.3f} ats={ats:.4f}",
              flush=True)

    host_diag(params, state, "init      ")
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        rng, k = jax.random.split(rng)
        params, opt_state, state, loss, aux = step(
            params, opt_state, state, batches[i % len(batches)], k)
        if (i + 1) % args.every == 0:
            lv = {k2: float(v) for k2, v in aux.items()}
            print(f"step {i+1:4d}: loss={float(loss):.4f} " +
                  " ".join(f"{k2.replace('loss_','')}={v:.3f}" for k2, v in lv.items()),
                  flush=True)
            host_diag(params, state, f"step {i+1:4d}")
    print(f"wall {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
