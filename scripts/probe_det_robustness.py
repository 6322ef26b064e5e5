"""Round-5 detection robustness probes (VERDICT r4 items 4 + 5). Real TPU.

Two modes:

  --mode takeoff       From-scratch takeoff across >= 3 seeds with the
                       SHIPPED DEFAULT selection config: approx_max_k
                       proposal top-k plus the new exact-top-k warmup
                       (models/faster_rcnn exact_topk_warmup_steps=500).
                       The r4 A/B (artifacts/approx_exact_ab.json) showed
                       from-scratch approx stalling >1400 steps on one rng
                       stream where exact took off by ~300 — seed stream
                       10_000 here IS that stall stream, so a pass is a
                       targeted regression proof that the warmup closes the
                       cold-start hazard. PASS = every seed's FINAL-eval
                       val_ats >= --ats_floor and rpn recall >= 0.8.
                       Writes artifacts/det_takeoff_seeds.json.

  --mode label_offset  A/B of the reference's raw-category labels (class 0
                       collides with background, bb_fast_rcnn.py:69,172-188)
                       vs --label_offset 1 (torchvision convention) on a
                       painted-box dataset that INCLUDES category-0 boxes
                       (data/synthetic.py paint_cat0) — the config where the
                       collision has measurable cost: a category-0 GT can
                       never be emitted by eval (class 0 is dropped as
                       background). Reports val_ats + val_cls_acc per arm.
                       Writes artifacts/det_label_offset_ab.json.

Both use the gate's probe-validated learnable config (single 44 px box
scale + matching anchor, dilated+normed RPN head — scripts/run_tpu_gate.py).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_data(path, paint_cat0=False, scenes=6, samples=16):
    from driving_dirty_tpu.data.synthetic import generate

    if not os.path.isdir(path):
        generate(path, scenes=scenes, samples=samples, labeled_scenes=scenes,
                 seed=0, structured=True, paint_boxes=True,
                 road_from_tint=True, road_noise=(0.2, 0.01),
                 paint_scale=(44.0, 44.0), paint_cat0=paint_cat0)
    return path


def build_task(data, scenes=6, samples=16, **extra):
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    task = FasterRCNNRoadMap(dict(
        pretrained_path=None, batch_size=4, precision=16,
        unfreeze_epoch_no=0, max_bb=16,
        anchor_sizes=(44,), anchor_ratios=(1.0,),
        rpn_head_dilations=(4, 8, 16), rpn_head_norm=1,
        val_ats_score_thresh=0.05,
        num_labeled_scenes=scenes, link=data, samples_per_scene=samples,
        output_img_freq=0, **extra))
    task.current_epoch = 0
    return task


def train_arm(task, steps, rng_base, seed, log_every=50, eval_every=200,
              tag=""):
    """Hand-driven loop honoring the task's step_variant hook (the same
    program-per-variant switching the Trainer does)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    tx = optax.adam(1e-3)
    params, state = task.init(jax.random.PRNGKey(seed))
    opt_state = tx.init(params)
    batches = [jax.tree.map(jnp.asarray, b) for b, _m in iter(task.train_loader())]
    vb = jax.tree.map(jnp.asarray, next(iter(task.val_loader()))[0])
    nb = int(jax.tree.leaves(vb)[0].shape[0])

    def make_step():
        @jax.jit
        def step(p, o, s, batch, rng):
            def lf(p):
                loss, (ns, m) = task.loss(p, s, batch, rng, train=True)
                return loss, ns
            (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(p)
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2, ns, loss
        return step

    steps_by_variant = {}
    variant_fn = getattr(task, "step_variant", lambda s: None)

    def eval_metrics(p, s):
        m = task.host_val_metrics(p, s, vb, bmask=np.ones(nb, bool))
        return {k: m[k][0] for k in
                ("val_ats", "val_rpn_recall", "val_cls_acc") if k in m}

    losses, series = [], []
    t0 = time.perf_counter()
    for i in range(steps):
        v = variant_fn(i)
        if v not in steps_by_variant:
            steps_by_variant[v] = make_step()
        rng = jax.random.PRNGKey(rng_base + i)
        params, opt_state, state, loss = steps_by_variant[v](
            params, opt_state, state, batches[i % len(batches)], rng)
        if i % log_every == 0 or i == steps - 1:
            l = float(loss)
            losses.append((i, l))
            print(f"  [{tag}] step {i} ({v or 'steady'}): loss {l:.4f}",
                  flush=True)
        if (i + 1) % eval_every == 0 or i == steps - 1:
            m = eval_metrics(params, state)
            series.append((i + 1, m))
            print(f"  [{tag}] step {i+1}: " +
                  " ".join(f"{k} {v:.4f}" for k, v in m.items()), flush=True)
    # takeoff probes judge the FINAL state: averaging over the whole eval
    # tail would mix pre-takeoff zeros into the endpoint (a takeoff curve
    # is 0 ... 0, rise, converged). Steady-state A/Bs (probe_approx_exact_ab)
    # tail-average instead because their arms start converged.
    final = series[-1][1] if series else {}

    return {"losses": losses,
            "series": [(s, m) for s, m in series],
            "val_ats": final.get("val_ats", 0.0),
            "val_rpn_recall": final.get("val_rpn_recall", 0.0),
            "val_cls_acc": final.get("val_cls_acc", 0.0),
            "variants_used": sorted({str(k) for k in steps_by_variant}),
            "train_seconds": time.perf_counter() - t0,
            "_carry": (params, state, vb)}


def cat_recall(task, params, state, vb, score_thr=0.05):
    """Per-category GEOMETRIC detection recall on the val batch: fraction
    of GT boxes (split category==0 vs >0) matched at axis-aligned IoU >= 0.5
    by ANY detection above the score floor, label ignored. This is the
    collision's signature endpoint: under raw labels a category-0 GT can
    only be found via misclassification (its proposals are trained toward
    background), under label_offset=1 it is a regular foreground class."""
    import jax
    import numpy as np
    from driving_dirty_tpu.ops.coords import corners_to_aabb

    dets = jax.jit(lambda p, s, im, rd: task.predict(p, s, im, rd))(
        params, state, vb["images"], vb.get("road"))
    db = np.asarray(dets["boxes"], np.float32)
    dv = np.asarray(dets["valid"]) & (np.asarray(dets["scores"]) > score_thr)
    gtb = np.asarray(corners_to_aabb(vb["boxes"]), np.float32)
    gtv = np.asarray(vb["box_valid"])
    cats = np.asarray(vb["categories"])
    hits = {0: [], 1: []}
    for j in range(len(gtb)):
        g = gtb[j][gtv[j]]
        c = cats[j][gtv[j]]
        d = db[j][dv[j]]
        for gi in range(len(g)):
            if len(d) == 0:
                iou_best = 0.0
            else:
                x0 = np.maximum(d[:, 0], g[gi, 0]); y0 = np.maximum(d[:, 1], g[gi, 1])
                x1 = np.minimum(d[:, 2], g[gi, 2]); y1 = np.minimum(d[:, 3], g[gi, 3])
                inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
                ad = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
                ag = (g[gi, 2] - g[gi, 0]) * (g[gi, 3] - g[gi, 1])
                iou_best = float((inter / np.maximum(ad + ag - inter, 1e-9)).max())
            hits[0 if c[gi] == 0 else 1].append(float(iou_best >= 0.5))
    return {"cat0_recall": (sum(hits[0]) / len(hits[0])) if hits[0] else None,
            "cat0_count": len(hits[0]),
            "other_recall": (sum(hits[1]) / len(hits[1])) if hits[1] else None,
            "other_count": len(hits[1])}


def mode_takeoff(args):
    data = ensure_data("/tmp/dd_gate_tpu")
    out = {"mode": "takeoff", "steps": args.steps,
           "config": "shipped default: approx_max_k + exact_topk_warmup_steps=500",
           "note": "rng stream 10000 is the r4 approx-stall stream "
                   "(artifacts/approx_exact_ab.json header)",
           "seeds": {}}
    ok = True
    for seed, rng_base in ((0, 10_000), (1, 20_000), (2, 30_000)):
        print(f"== seed {seed} (rng_base {rng_base}) ==", flush=True)
        task = build_task(data)
        r = train_arm(task, args.steps, rng_base, seed,
                      tag=f"seed{seed}")
        r.pop("_carry", None)
        r["ok"] = bool(r["val_ats"] >= args.ats_floor
                       and r["val_rpn_recall"] >= 0.8)
        ok &= r["ok"]
        out["seeds"][str(seed)] = r
        print(f"seed {seed}: val_ats {r['val_ats']:.4f} recall "
              f"{r['val_rpn_recall']:.4f} -> {'OK' if r['ok'] else 'FAIL'}",
              flush=True)
    out["ats_floor"] = args.ats_floor
    out["all_ok"] = ok
    return out, "artifacts/det_takeoff_seeds.json"


def mode_label_offset(args):
    """Multi-seed A/B: a single run per arm cannot separate the label
    convention's effect from the documented from-scratch bistability
    (docs/DETECTION_PARITY.md divergence 1 — the first single-seed run of
    this probe saw offset1 hit exactly that collapse: RPN recall, which is
    label-agnostic, fell 1.0 -> 0.27, implicating trunk instability, not
    the classifier target convention). Each arm therefore trains
    --ab_seeds independent (init, data-order) streams; per-arm endpoint =
    median over seeds, with every seed recorded."""
    data = ensure_data("/tmp/dd_cat0_tpu", paint_cat0=True)
    out = {"mode": "label_offset", "steps": args.steps,
           "seeds_per_arm": args.ab_seeds,
           "dataset": "painted boxes INCLUDING category 0 (paint_cat0)",
           "arms": {}}

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])

    for offset in (0, 1):
        name = f"offset{offset}"
        runs = []
        for seed in range(args.ab_seeds):
            tag = f"{name}/seed{seed}"
            print(f"== arm {tag} ==", flush=True)
            task = build_task(data, label_offset=offset)
            r = train_arm(task, args.steps, 40_000 + 10_000 * seed, seed,
                          tag=tag)
            params, state, vb = r.pop("_carry")
            r["recall_by_category"] = cat_recall(task, params, state, vb)
            print(f"  [{tag}] {r['recall_by_category']}", flush=True)
            runs.append(r)
        agg = {
            "val_ats": med([r["val_ats"] for r in runs]),
            "val_cls_acc": med([r["val_cls_acc"] for r in runs]),
            "val_rpn_recall": med([r["val_rpn_recall"] for r in runs]),
            "cat0_recall": med([r["recall_by_category"]["cat0_recall"] or 0.0
                                for r in runs]),
            "other_recall": med([r["recall_by_category"]["other_recall"] or 0.0
                                 for r in runs]),
        }
        out["arms"][name] = {"median": agg, "seeds": runs}
    a0 = out["arms"]["offset0"]["median"]
    a1 = out["arms"]["offset1"]["median"]
    out["delta_median"] = {k: a1[k] - a0[k] for k in a0}
    print("label_offset A/B (median over "
          f"{args.ab_seeds} seeds): ats {a0['val_ats']:.4f} -> "
          f"{a1['val_ats']:.4f} (delta {out['delta_median']['val_ats']:+.4f});"
          f" cls_acc {a0['val_cls_acc']:.4f} -> {a1['val_cls_acc']:.4f}; "
          f"cat0_recall {a0['cat0_recall']:.4f} -> {a1['cat0_recall']:.4f}",
          flush=True)
    return out, "artifacts/det_label_offset_ab.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["takeoff", "label_offset"],
                    required=True)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--ats_floor", type=float, default=0.05)
    ap.add_argument("--ab_seeds", type=int, default=3,
                    help="independent seeds per arm in --mode label_offset")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    from driving_dirty_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    out, path = (mode_takeoff if args.mode == "takeoff" else mode_label_offset)(args)
    out["backend"] = jax.default_backend()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
