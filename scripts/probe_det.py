"""Stage bisect of Faster-RCNN inference on TPU.

    python scripts/probe_det.py [--batch 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--precision", type=int, default=16, choices=[8, 16, 32])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    enable_compilation_cache()
    B = args.batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (B, 6, 256, 306, 3), np.uint8))
    road = jnp.asarray((rng.rand(B, 800, 800) > 0.5).astype(np.float32))
    fr = FasterRCNNRoadMap(dict(pretrained_path=None, ae_hidden_dim=128,
                                ae_latent_dim=64, precision=args.precision,
                                batch_size=B))
    params, state = fr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    if args.precision == 8:
        fr.calibrate_int8(params, state, images, road)  # eager static scales

    def bb(p, s, x, r):
        f, _ = fr.backbone_features(p, s, x, r, train=False, rng=key)
        return f

    head = fr.head

    stages = {
        "backbone": lambda p, s, x, r: (lambda f: (f, jnp.sum(f[:, ::32, ::32, 0].astype(jnp.float32))))(bb(p, s, x, r)),
        "+rpn": lambda p, s, x, r: (lambda f: (lambda o_d: (o_d[0], jnp.sum(o_d[0][:, ::512].astype(jnp.float32))))(head.rpn_forward(p["head"], f)))(bb(p, s, x, r)),
        "+proposals": lambda p, s, x, r: (lambda f: (lambda od: (lambda pr: (pr[0], jnp.sum(pr[0][:, ::64].astype(jnp.float32))))(head.proposals(od[0], od[1], train=False)))(head.rpn_forward(p["head"], f)))(bb(p, s, x, r)),
        "+roi_feats": lambda p, s, x, r: (lambda f: (lambda od: (lambda pr: (lambda e: (e, jnp.sum(e[:, ::64, ::64].astype(jnp.float32))))(head.roi_features(p["head"], f, pr[0])))(head.proposals(od[0], od[1], train=False)))(head.rpn_forward(p["head"], f)))(bb(p, s, x, r)),
        "full_eval": lambda p, s, x, r: (lambda d: (d["boxes"], jnp.sum(d["scores"])))(head.forward_eval(p["head"], bb(p, s, x, r))),
    }

    for name, fn in stages.items():
        f = jax.jit(fn)
        float(f(params, state, images, road)[1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(params, state, images, road)
        float(out[1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:12s}: {dt*1e3:8.2f} ms/batch  {B/dt:8.1f} scenes/s", flush=True)


if __name__ == "__main__":
    main()
