"""Bisect fused-trunk cost: XLA tile prep vs pallas kernel vs variants.

    python scripts/probe_trunk_split.py [--batch 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pipelined(f, args_, iters=5, depth=4, warmup=2):
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
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.pallas import trunk as T

    enable_compilation_cache()
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 256, 1836, 3).astype(np.float32)).astype(dt)
    ws = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1).astype(dt)
          for s in [(3, 3, 3, 32), (32,), (3, 3, 32, 32), (32,),
                    (3, 3, 32, 32), (32,)]]

    TH, TW, TWIN, nw = 16, 128, 136, 8

    def prep_only(x):
        def chunk(xc):
            return T._prep_input(xc, TH, TW, TWIN, nw)
        t = lax.map(chunk, x.reshape(-1, 16, 256, 1836, 3))
        return t, jnp.sum(t[..., ::8, ::32, 0].astype(jnp.float32))

    f_prep = jax.jit(prep_only)
    dt_prep = pipelined(f_prep, (x,))
    print(f"prep only       : {dt_prep*1e3:8.2f} ms/batch  {args.batch/dt_prep:8.1f} scenes/s", flush=True)

    def fused(x):
        y = T.fused_trunk(x, *ws)
        return y, jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))

    f_fused = jax.jit(fused)
    dt_f = pipelined(f_fused, (x,))
    print(f"prep + kernel   : {dt_f*1e3:8.2f} ms/batch  {args.batch/dt_f:8.1f} scenes/s", flush=True)


if __name__ == "__main__":
    main()
