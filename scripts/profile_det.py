"""Capture jax.profiler traces of the detection train and eval steps.

Runs faster_rcnn_rm at production scale (800x800 layout, default anchors/
proposal counts) on the real TPU, traces a few steady-state steps of each
phase, and prints the top device ops via trace_top_ops — the evidence base
for the next round of detection optimization.

    python scripts/profile_det.py [--batch 16] [--steps 5] [--out /tmp/det_traces]
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/det_traces")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    enable_compilation_cache()
    b = args.batch
    task = FasterRCNNRoadMap(dict(pretrained_path=None, batch_size=b,
                                  precision=16, max_bb=16))
    params, state = task.init(jax.random.PRNGKey(0))
    rng0 = np.random.RandomState(0)
    boxes = np.zeros((b, 16, 2, 4), np.float32)
    valid = np.zeros((b, 16), bool)
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    valid[:, 0] = True
    batch = {
        "images": jnp.asarray(rng0.rand(b, 6, 256, 306, 3).astype(np.float32)),
        "road": jnp.asarray((rng0.rand(b, 800, 800) > 0.5).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
        "categories": jnp.asarray(np.full((b, 16), 3, np.int32)),
    }
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(p, o, s, bt, rng):
        def lf(p):
            loss, (ns, m) = task.loss(p, s, bt, rng, train=True)
            return loss, ns
        (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, ns, loss

    @jax.jit
    def eval_step(p, s, im, rd):
        dets = task.predict(p, s, im, rd)
        return jnp.sum(dets["scores"])

    rng = jax.random.PRNGKey(1)
    for phase, run in (
        ("train", lambda: float(train_step(params, opt, state, batch, rng)[3])),
        ("eval", lambda: float(eval_step(params, state, batch["images"], batch["road"]))),
    ):
        run(); run()  # compile + warm OUTSIDE the trace
        d = os.path.join(args.out, phase)
        os.makedirs(d, exist_ok=True)
        t0 = time.perf_counter()
        jax.profiler.start_trace(d)
        for _ in range(args.steps):
            run()
        jax.profiler.stop_trace()
        dt = (time.perf_counter() - t0) / args.steps
        print(f"\n=== {phase}: {dt*1e3:.1f} ms/step ({b/dt:.1f} scenes/s), "
              f"trace -> {d} ===", flush=True)
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "trace_top_ops.py"),
                        d, "-n", str(args.top), "--pid-filter", "device:TPU"])


if __name__ == "__main__":
    main()
