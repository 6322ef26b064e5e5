"""Honest trunk-vs-head split: pipelined scenes/s for (a) conv trunk only,
(b) the full standard roadmap forward. Head cost = difference.

    python scripts/probe_split.py [--batch 128]
"""
import argparse
import time


def pipelined(f, args_, iters=20, depth=8, warmup=3):
    inflight = []
    for _ in range(warmup):
        float(f(*args_)[1])
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
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    enable_compilation_cache()
    task = RoadMapBCEv2(dict(pretrained_path=None, ae_hidden_dim=128,
                             ae_latent_dim=64, precision=16))
    params, state = task.init(jax.random.PRNGKey(0))
    enc = task.ae.encoder

    def trunk(params, x):
        x = x.astype(jnp.bfloat16)
        from driving_dirty_tpu.ops.stitch import wide_stitch

        v = wide_stitch(x)
        out, _ = enc.apply(params["encoder"], state["encoder"], v,
                           train=False, rng=jax.random.PRNGKey(0), c3_only=True)
        return out, jnp.sum(out[:, ::64, ::64, :])

    def full(params, x):
        logits, _, _ = task.forward(params, state, x, train=False,
                                    rng=jax.random.PRNGKey(0))
        m = logits > 0
        return m, jnp.sum(m)

    x = jnp.asarray(np.random.RandomState(0).rand(args.batch, 6, 256, 306, 3).astype(np.float32))
    ft = jax.jit(trunk)
    ff = jax.jit(full)
    dt_t = pipelined(ft, (params, x))
    dt_f = pipelined(ff, (params, x))
    b = args.batch
    print(f"trunk only : {dt_t*1e3:7.2f} ms/batch  ({b/dt_t:8.1f} scenes/s)")
    print(f"full fwd   : {dt_f*1e3:7.2f} ms/batch  ({b/dt_f:8.1f} scenes/s)")
    print(f"head (diff): {(dt_f-dt_t)*1e3:7.2f} ms/batch")


if __name__ == "__main__":
    main()
