"""Inference throughput for every model family on real TPU (v5e).

The headline bench (bench.py) covers roadmap inference; this sweeps the rest
of the zoo at reference dims. Pipelined dispatch, every output synced.

    python scripts/bench_all.py [--batch 64] [--iters 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pipelined(f, args_, iters, depth=4, warmup=2):
    for _ in range(warmup):
        float(f(*args_)[1])
    inflight = []
    t0 = time.perf_counter()
    for _ in range(iters):
        inflight.append(f(*args_)[1])
        if len(inflight) > depth:
            float(inflight.pop(0))
    for d in inflight:
        float(d)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from driving_dirty_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (B, 6, 256, 306, 3), np.uint8))
    road = jnp.asarray((rng.rand(B, 800, 800) > 0.5).astype(np.float32))
    common = dict(pretrained_path=None, ae_hidden_dim=128, ae_latent_dim=64,
                  precision=16, batch_size=B)

    def report(name, fn, args_):
        f = jax.jit(fn)
        dt = pipelined(f, args_, args.iters)
        print(f"{name:16s}: {dt*1e3:8.2f} ms/batch  {B/dt:8.1f} scenes/s", flush=True)

    # autoencoder reconstruction (pretext forward)
    from driving_dirty_tpu.models.basic_ae import BasicAE

    ae = BasicAE(dict(hidden_dim=128, latent_dim=64, precision=16, batch_size=B))
    pa, sa = ae.init(jax.random.PRNGKey(0))
    report("basic_ae", lambda p, s, x: (lambda yh: (yh, jnp.sum(yh[:, ::64, ::64, :].astype(jnp.float32))))(
        ae.forward(p, s, x, train=False, rng=jax.random.PRNGKey(0))[0]), (pa, sa, images))

    # spatial occupancy (with roadmap input, the registry's spatial_rm)
    from driving_dirty_tpu.models.spatial_bb import BBSpatialRoadMap

    sp = BBSpatialRoadMap(common)
    ps, ss = sp.init(jax.random.PRNGKey(0))
    report("spatial_rm", lambda p, s, x, r: (lambda pr: (pr, jnp.sum(pr[:, ::64, ::64].astype(jnp.float32))))(
        sp.forward(p, s, x, r, train=False, rng=jax.random.PRNGKey(0))[0]), (ps, ss, images, road))

    # joint multitask
    from driving_dirty_tpu.models.multitask import MultiTask

    mt = MultiTask(common)
    pm, sm = mt.init(jax.random.PRNGKey(0))
    def mt_fn(p, s, x):
        rm, box, _ = mt.forward(p, s, x, train=False, rng=jax.random.PRNGKey(0))
        return rm, jnp.sum((rm > 0).astype(jnp.float32)[:, ::64, ::64]) + jnp.sum(box[:, ::64, ::64])
    report("multitask", mt_fn, (pm, sm, images))

    # faster-rcnn detection (roadmap-fused variant, registry default)
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    fr = FasterRCNNRoadMap(common)
    pf, sf = fr.init(jax.random.PRNGKey(0))
    def fr_fn(p, s, x, r):
        dets = fr.predict(p, s, x, r)
        leaf = jax.tree.leaves(dets)[0]
        return dets, jnp.sum(leaf.astype(jnp.float32))
    report("faster_rcnn_rm", fr_fn, (pf, sf, images, road))


if __name__ == "__main__":
    main()
