"""Per-segment microbenchmark of the roadmap inference path on the real chip.

Times each encoder stage separately (conv c1/c2/c3, flatten+maxpool+dense
head, 640k output head) at bench shapes so kernel work can be targeted at the
true hot spot. Uses the digest-fetch pattern (block_until_ready is a no-op on
the tunneled axon platform).

    python scripts/micro_bench.py [--batch 128] [--precision 16]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, args, iters=10, warmup=2):
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--precision", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.nn.autoencoder import Encoder

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.precision == 16 else jnp.float32
    b = args.batch
    enc = Encoder(hidden_dim=128, latent_dim=64)
    params, state = enc.init(jax.random.PRNGKey(0))
    c1, c2, c3 = enc._convs()

    x = jnp.zeros((b, 256, 1836, 3), dtype)
    # params go in as ARGUMENTS: closed-over arrays are baked into the HLO as
    # constants, and the 940032x128 head weight exceeds the axon tunnel's
    # remote-compile upload limit (HTTP 413).
    f_c1 = jax.jit(lambda p, v: jax.nn.relu(c1.apply(p["c1"], v)))
    x1 = f_c1(params, x)
    f_c2 = jax.jit(lambda p, v: jax.nn.relu(c2.apply(p["c2"], v)))
    x2 = f_c2(params, x1)
    f_c3 = jax.jit(lambda p, v: jax.nn.relu(c3.apply(p["c3"], v)))
    x3 = f_c3(params, x2)

    from driving_dirty_tpu.ops import fastconv

    f_c1b = jax.jit(lambda p, v: jax.nn.relu(
        fastconv.conv3x3_s1_blocked(v, p["c1"]["w"], p["c1"].get("b"))))
    f_c2b = jax.jit(lambda p, v: jax.nn.relu(
        fastconv.conv3x3_s1_blocked(v, p["c2"]["w"], p["c2"].get("b"))))
    f_c3b = jax.jit(lambda p, v: jax.nn.relu(
        fastconv.conv3x3_s2_blocked(v, p["c3"]["w"], p["c3"].get("b"))))
    _ = f_c1b(params, x), f_c2b(params, x1), f_c3b(params, x2)

    from driving_dirty_tpu.core import layers as L

    def head(params, state, v):
        bb = v.shape[0]
        flat = jnp.transpose(v, (0, 3, 1, 2)).reshape(bb, -1)
        flat = L.max_pool_flat(flat, enc.pooling_size)
        from driving_dirty_tpu.nn.autoencoder import DenseBlock

        fc1 = DenseBlock(enc.conv_out_dim(), enc.hidden_dim)
        fc2 = DenseBlock(enc.hidden_dim, enc.hidden_dim)
        h, _ = fc1.apply(params["fc1"], state["fc1"], flat, train=False, rng=jax.random.PRNGKey(0))
        h, _ = fc2.apply(params["fc2"], state["fc2"], h, train=False, rng=jax.random.PRNGKey(0))
        return L.Linear(enc.hidden_dim, enc.latent_dim).apply(params["fc_z_out"], h)

    f_head = jax.jit(head)
    z = f_head(params, state, x3)

    out_head = L.Linear(64, 800 * 800)
    op = out_head.init(jax.random.PRNGKey(1))
    f_out = jax.jit(lambda p, v: jax.nn.sigmoid(out_head.apply(p, v).astype(jnp.float32)))
    _ = f_out(op, z)

    names = ["c1 (3->32)", "c2 (32->32)", "c3 (32->32 s2)",
             "c1 blocked", "c2 blocked", "c3 blocked",
             "latent head", "640k head"]
    fns = [(f_c1, (params, x)), (f_c2, (params, x1)), (f_c3, (params, x2)),
           (f_c1b, (params, x)), (f_c2b, (params, x1)), (f_c3b, (params, x2)),
           (f_head, (params, state, x3)), (f_out, (op, z))]
    total = 0.0
    for name, (fn, a) in zip(names, fns):
        dt = timeit(fn, a, iters=args.iters)
        total += dt
        print(f"{name:18s} {dt*1e3:8.2f} ms  ({b/dt:9.1f} scenes/s)")
    print(f"{'sum':18s} {total*1e3:8.2f} ms  ({b/total:9.1f} scenes/s)")
    print("backend:", jax.default_backend(), "dtype:", dtype.__name__)


if __name__ == "__main__":
    main()
