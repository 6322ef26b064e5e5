"""A/B: approx vs exact top-k in detection TRAINING — does quality match?

DETECTION_PARITY divergences 1 and 9 claim the default `lax.approx_max_k`
proposal selection + approximate RPN sampling are "empirically irrelevant"
to training quality. Until now only count/normalizer invariants backed that.
This probe trains faster_rcnn_rm twice from the same init on the same
synthetic stream — once with --exact_topk 0 (default approx) and once with
--exact_topk 1 (torchvision-style exact) — and compares loss trajectories
plus end-state val_ats on a held-out batch.

MUST run on real TPU: on CPU approx_max_k lowers to exact top_k (verified),
so the arms are bitwise identical there and the comparison is vacuous.

    python scripts/probe_approx_exact_ab.py [--steps 200] [--batch 8]

Writes artifacts/approx_exact_ab.json and prints a PASS/FAIL verdict
(final-quarter mean losses within --tol relative).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_batch(rs, b, max_bb=16):
    """Synthetic labeled batch with learnable structure: boxes whose pixel
    neighborhoods are brightened in the camera views, so the detector has
    signal to fit (same recipe as the convergence gate)."""
    import numpy as np

    images = rs.rand(b, 6, 256, 306, 3).astype(np.float32) * 0.2
    boxes = np.zeros((b, max_bb, 2, 4), np.float32)
    valid = np.zeros((b, max_bb), bool)
    cats = np.zeros((b, max_bb), np.int32)
    road = np.zeros((b, 800, 800), np.float32)
    for i in range(b):
        n = rs.randint(2, 6)
        for j in range(n):
            cx, cy = rs.uniform(-30, 30, 2)
            w, h = rs.uniform(1.5, 4.0, 2)
            boxes[i, j, 0] = [cx + w, cx + w, cx - w, cx - w]
            boxes[i, j, 1] = [cy + h, cy - h, cy + h, cy - h]
            valid[i, j] = True
            cats[i, j] = rs.randint(1, 9)
            # paint the box into every view so the backbone sees it
            px, py = int(cx * 10 + 400), int(-cy * 10 + 400)
            x0, x1 = max(0, (px - 20) * 306 // 800), min(306, (px + 20) * 306 // 800)
            y0, y1 = max(0, (py - 20) * 256 // 800), min(256, (py + 20) * 256 // 800)
            images[i, :, y0:y1, x0:x1, :] += 0.6
            road[i, max(0, py - 40):py + 40, max(0, px - 40):px + 40] = 1.0
    return {
        "images": np.clip(images, 0, 1),
        "boxes": boxes,
        "box_valid": valid,
        "categories": cats,
        "road": road,
    }


def run_arm(exact, steps, batch_size, log_every, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    task = FasterRCNNRoadMap(dict(
        pretrained_path=None, ae_hidden_dim=32, ae_latent_dim=32,
        batch_size=batch_size, precision=16, exact_topk=exact,
        val_ats_score_thresh=0.05,
    ))
    params, state = task.init(jax.random.PRNGKey(seed))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, s, batch, rng):
        def lf(p):
            loss, (ns, metrics) = task.loss(p, s, batch, rng, train=True)
            return loss, (ns, metrics)
        (loss, (ns, metrics)), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, ns, loss

    rs = np.random.RandomState(1234)  # same stream for both arms
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in synth_batch(rs, batch_size).items()}
        rng = jax.random.PRNGKey(10_000 + i)  # same per-step rng across arms
        params, opt_state, state, loss = step(params, opt_state, state, batch, rng)
        if i % log_every == 0 or i == steps - 1:
            l = float(loss)
            losses.append((i, l))
            print(f"  [{'exact' if exact else 'approx'}] step {i}: loss {l:.4f}",
                  flush=True)
    dt = time.perf_counter() - t0

    # held-out val_ats (same eval batch for both arms)
    rs_val = np.random.RandomState(777)
    vb = {k: jnp.asarray(v) for k, v in synth_batch(rs_val, batch_size).items()}
    m = task.host_val_metrics(params, state, vb, bmask=np.ones(batch_size, bool))
    val_ats = m.get("val_ats", (0.0, 0.0))[0]
    return {"losses": losses, "val_ats": val_ats, "train_seconds": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--tol", type=float, default=0.15,
                    help="max relative diff of final-quarter mean losses")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"WARNING: backend={backend}; approx_max_k is exact on CPU — "
              "this A/B only distinguishes the arms on TPU", flush=True)

    from driving_dirty_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
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
    verdict = "PASS" if rel <= args.tol else "FAIL"
    out = {
        "backend": backend, "steps": args.steps, "batch": args.batch,
        "approx": results["approx"], "exact": results["exact"],
        "final_quarter_mean_loss": {"approx": ta, "exact": te},
        "relative_diff": rel, "tol": args.tol, "verdict": verdict,
    }
    os.makedirs("artifacts", exist_ok=True)
    path = os.path.join("artifacts", "approx_exact_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{verdict}: final-quarter mean loss approx={ta:.4f} exact={te:.4f} "
          f"(rel diff {rel:.1%}, tol {args.tol:.0%}); "
          f"val_ats approx={results['approx']['val_ats']:.4f} "
          f"exact={results['exact']['val_ats']:.4f} -> {path}", flush=True)


if __name__ == "__main__":
    main()
