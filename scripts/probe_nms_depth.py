"""NMS eval next-bottleneck probe (VERDICT r4 item 7). Real TPU.

The detection eval path's NMS while-loops were profiled at ~1/3 of eval
device time (ops/detection.py cap note). Hypothesis: the loop is
control-bound — its body is a cheap [K, K] VPU reduce, so replacing the
convergence-checked while with N straight-line suppression applications
(ops.detection.nms_fixed fixed_depth) removes per-iteration loop overhead
at identical output (chains on real score distributions converge in a
handful of applications; the antichain intersect keeps deeper cases
well-defined).

Measures forward_eval scenes/s at production scale (800 px layout, default
5x3 anchors, 2000-proposal RPN NMS + class-wise second-stage NMS) for
depth in {0 (while), 8, 16, 32}, and verifies depth-16 output equals the
while-loop output on the same inputs. Writes artifacts/nms_depth_probe.json.

    python scripts/probe_nms_depth.py [--batch 16] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--depths", type=int, nargs="+", default=[0, 8, 16, 32])
    ap.add_argument("--out", default="artifacts/nms_depth_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)

    b = args.batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, 6, 256, 306, 3).astype(np.float32))
    road = jnp.asarray((rng.rand(b, 800, 800) > 0.5).astype(np.float32))

    results = {"batch": b, "iters": args.iters, "depths": {}}
    outputs = {}
    params = state = None
    for depth in args.depths:
        task = FasterRCNNRoadMap(dict(pretrained_path=None, batch_size=b,
                                      precision=16, max_bb=16,
                                      nms_fixed_depth=depth))
        if params is None:
            params, state = task.init(jax.random.PRNGKey(0))
        fn = jax.jit(lambda p, s, im, rd: task.predict(p, s, im, rd))
        # warm + correctness capture (block via float readback: axon's
        # block_until_ready is a no-op)
        dets = fn(params, state, images, road)
        digest = float(jnp.sum(dets["scores"]))
        outputs[depth] = jax.tree.map(np.asarray, dets)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            dets = fn(params, state, images, road)
            digest = float(jnp.sum(dets["scores"]))
        dt = time.perf_counter() - t0
        sps = b * args.iters / dt
        results["depths"][str(depth)] = {"scenes_per_sec": round(sps, 2),
                                         "digest": digest}
        print(f"depth {depth}: {sps:.1f} scenes/s eval", flush=True)

    # correctness: fixed-depth output must equal the while-loop's bitwise
    base = outputs[0]
    for depth in args.depths:
        if depth == 0:
            continue
        same = all(np.array_equal(base[k], outputs[depth][k]) for k in base)
        results["depths"][str(depth)]["equals_while"] = bool(same)
        print(f"depth {depth}: equals while-loop output: {same}", flush=True)

    base_sps = results["depths"]["0"]["scenes_per_sec"]
    best = max(results["depths"].items(), key=lambda kv: kv[1]["scenes_per_sec"])
    results["speedup_best"] = round(best[1]["scenes_per_sec"] / base_sps, 3)
    results["best_depth"] = int(best[0])
    results["backend"] = jax.default_backend()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"best depth {best[0]}: {best[1]['scenes_per_sec']} scenes/s "
          f"({results['speedup_best']}x vs while); wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
