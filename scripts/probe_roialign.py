"""Isolate and time RoIAlign variants at detection-eval scale.

Forward-only (eval has no backward): [8, 400, 400, 32] bf16 features,
1000 rois/image — the config the eval profile showed costing ~27 ms/step
(dense separable matmul + a same-size relayout copy, 3.2 GB HBM traffic).

    python scripts/probe_roialign.py [--batch 8] [--rois 1000] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rois", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check", action="store_true", help="compare outputs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.ops import detection as det

    enable_compilation_cache()
    b, r = args.batch, args.rois
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(b, 400, 400, 32).astype(np.float32)).astype(jnp.bfloat16)
    rois = jnp.asarray(
        np.stack([
            (lambda x0, y0: np.stack([x0, y0, x0 + rng.rand(r) * 300 + 8,
                                      y0 + rng.rand(r) * 300 + 8], -1))(
                rng.rand(r) * 450, rng.rand(r) * 450)
            for _ in range(b)
        ]).astype(np.float32)
    )  # [b, r, 4] in image coords (scale 1/2 applied inside)

    variants = {
        "matmul (current)": lambda f, ro: det.batched_roi_align(
            f, ro, output_size=7, spatial_scale=0.5, sampling_ratio=2),
    }
    if hasattr(det, "batched_roi_align_fused"):
        variants["pallas fused"] = lambda f, ro: det.batched_roi_align_fused(
            f, ro, output_size=7, spatial_scale=0.5, sampling_ratio=2)

    outs = {}
    for name, fn in variants.items():
        g = jax.jit(lambda f, ro: jnp.sum(fn(f, ro).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(g(feats, rois))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(3):
            float(g(feats, rois))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(g(feats, rois))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:8.2f} ms  ({b/dt:7.1f} img/s)", flush=True)
        if args.check:
            outs[name] = np.asarray(jax.jit(fn)(feats, rois).astype(jnp.float32))

    if args.check and len(outs) > 1:
        base = outs["matmul (current)"]
        for name, o in outs.items():
            if name == "matmul (current)":
                continue
            d = np.max(np.abs(o - base))
            print(f"{name}: max |diff| vs matmul = {d:.5f}")


if __name__ == "__main__":
    main()
