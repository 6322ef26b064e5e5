"""A/B: approx vs exact top-k in detection TRAINING — does QUALITY match?

DETECTION_PARITY divergences 1 and 9 claim the default `lax.approx_max_k`
proposal selection + approximate RPN sampling are "empirically irrelevant"
to training quality. The round-3 version of this probe compared only loss
trajectories (and both arms' val_ats was ~0 because the task itself was
unlearnable — VERDICT r3 weak 3). This round-4 version trains both arms on
the LEARNABLE layout-aligned painted-box dataset with the probe-validated
config (scripts/probe_det_learn.py: single 44 px scale + matching anchor,
dilated+normed RPN head) and compares the DETECTION-QUALITY endpoint:
held-out val_ats after training, plus the loss trajectories as before.

MUST run on real TPU: on CPU approx_max_k lowers to exact top_k (verified),
so the arms are bitwise identical there and the comparison is vacuous.

    python scripts/probe_approx_exact_ab.py [--steps 600] [--batch 4]

Writes artifacts/approx_exact_ab.json and prints a PASS/FAIL verdict:
PASS = final-quarter mean losses within --tol relative AND both arms reach
val_ats >= --ats_floor AND the arms' val_ats agree within --ats_tol abs.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/tmp/dd_gate_tpu"


def ensure_data(scenes=6, samples=16):
    from driving_dirty_tpu.data.synthetic import generate

    if not os.path.isdir(DATA):
        generate(DATA, scenes=scenes, samples=samples, labeled_scenes=scenes,
                 seed=0, structured=True, paint_boxes=True,
                 road_from_tint=True, road_noise=(0.2, 0.01),
                 paint_scale=(44.0, 44.0))


def run_arm(exact, steps, batch_size, log_every, seed=0, scenes=6, samples=16):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    task = FasterRCNNRoadMap(dict(
        pretrained_path=None, batch_size=batch_size, precision=16,
        exact_topk=exact, unfreeze_epoch_no=0, max_bb=16,
        anchor_sizes=(44,), anchor_ratios=(1.0,),
        rpn_head_dilations=(4, 8, 16), rpn_head_norm=1,
        val_ats_score_thresh=0.05,
        num_labeled_scenes=scenes, link=DATA, samples_per_scene=samples,
        output_img_freq=0))
    task.current_epoch = 0
    params, state = task.init(jax.random.PRNGKey(seed))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    batches = [jax.tree.map(jnp.asarray, b) for b, _m in iter(task.train_loader())]
    vb = jax.tree.map(jnp.asarray, next(iter(task.val_loader()))[0])

    @jax.jit
    def step(p, o, s, batch, rng):
        def lf(p):
            loss, (ns, metrics) = task.loss(p, s, batch, rng, train=True)
            return loss, (ns, metrics)
        (loss, (ns, metrics)), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, ns, loss

    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        rng = jax.random.PRNGKey(10_000 + i)  # same per-step rng across arms
        params, opt_state, state, loss = step(
            params, opt_state, state, batches[i % len(batches)], rng)
        if i % log_every == 0 or i == steps - 1:
            l = float(loss)
            losses.append((i, l))
            print(f"  [{'exact' if exact else 'approx'}] step {i}: loss {l:.4f}",
                  flush=True)
    dt = time.perf_counter() - t0

    # held-out DETECTION-QUALITY endpoint (same val batch for both arms)
    b = int(jax.tree.leaves(vb)[0].shape[0])
    m = task.host_val_metrics(params, state, vb, bmask=np.ones(b, bool))
    val_ats = m.get("val_ats", (0.0, 0.0))[0]
    recall = m.get("val_rpn_recall", (0.0, 0.0))[0]
    return {"losses": losses, "val_ats": val_ats, "val_rpn_recall": recall,
            "train_seconds": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--tol", type=float, default=0.15,
                    help="max relative diff of final-quarter mean losses")
    ap.add_argument("--ats_floor", type=float, default=0.05,
                    help="both arms must DETECT: held-out val_ats floor")
    ap.add_argument("--ats_tol", type=float, default=0.08,
                    help="max absolute val_ats difference between arms")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"WARNING: backend={backend}; approx_max_k is exact on CPU — "
              "this A/B only distinguishes the arms on TPU", flush=True)

    from driving_dirty_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    ensure_data()
    results = {}
    for exact in (0, 1):
        name = "exact" if exact else "approx"
        print(f"arm {name} (exact_topk={exact}):", flush=True)
        results[name] = run_arm(exact, args.steps, args.batch, args.log_every)

    def tail_mean(arm):
        ls = [l for _, l in results[arm]["losses"]]
        q = max(1, len(ls) // 4)
        return sum(ls[-q:]) / q

    ta, te = tail_mean("approx"), tail_mean("exact")
    rel = abs(ta - te) / max(abs(te), 1e-9)
    ats_a = results["approx"]["val_ats"]
    ats_e = results["exact"]["val_ats"]
    loss_ok = rel <= args.tol
    quality_ok = (min(ats_a, ats_e) >= args.ats_floor
                  and abs(ats_a - ats_e) <= args.ats_tol)
    verdict = "PASS" if (loss_ok and quality_ok) else "FAIL"
    out = {
        "backend": backend, "steps": args.steps, "batch": args.batch,
        "approx": results["approx"], "exact": results["exact"],
        "final_quarter_mean_loss": {"approx": ta, "exact": te},
        "relative_diff": rel, "tol": args.tol,
        "val_ats": {"approx": ats_a, "exact": ats_e,
                    "floor": args.ats_floor, "abs_tol": args.ats_tol},
        "loss_ok": loss_ok, "quality_ok": quality_ok, "verdict": verdict,
    }
    os.makedirs("artifacts", exist_ok=True)
    path = os.path.join("artifacts", "approx_exact_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{verdict}: final-quarter mean loss approx={ta:.4f} exact={te:.4f} "
          f"(rel diff {rel:.1%}, tol {args.tol:.0%}); "
          f"val_ats approx={ats_a:.4f} exact={ats_e:.4f} "
          f"(floor {args.ats_floor}, tol {args.ats_tol}) -> {path}", flush=True)


if __name__ == "__main__":
    main()
