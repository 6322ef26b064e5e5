"""A/B the encoder conv trunk: plain XLA convs vs the fused Pallas kernel.

    python scripts/probe_trunk.py [--batch 128] [--dtype bf16]
"""
import argparse
import time


def pipelined(f, args_, iters=20, depth=8, warmup=3):
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
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.pallas.trunk import fused_trunk, xla_trunk

    enable_compilation_cache()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 256, 1836, 3).astype(np.float32)).astype(dt)
    ws = [
        jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1).astype(dt)
        for s in [(3, 3, 3, 32), (32,), (3, 3, 32, 32), (32,), (3, 3, 32, 32), (32,)]
    ]

    def digest(y):
        return y, jnp.sum(y[:, ::64, ::64, :])

    f_plain = jax.jit(lambda x: digest(xla_trunk(x, *ws)))
    f_fused = jax.jit(lambda x: digest(fused_trunk(x, *ws)))

    # correctness spot check at full shape
    a = f_plain(x)[0][:2]
    b = f_fused(x)[0][:2]
    print("max|diff| @full shape:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))

    dt_p = pipelined(f_plain, (x,), iters=args.iters)
    dt_f = pipelined(f_fused, (x,), iters=args.iters)
    print(f"plain XLA trunk : {dt_p*1e3:8.2f} ms/batch  {args.batch/dt_p:8.1f} scenes/s")
    print(f"fused pallas    : {dt_f*1e3:8.2f} ms/batch  {args.batch/dt_f:8.1f} scenes/s")
    print(f"speedup         : {dt_p/dt_f:.3f}x")


if __name__ == "__main__":
    main()
