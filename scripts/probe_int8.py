"""Probe: int8 encoder trunk throughput vs bf16 (v5e has 2x int8 MACs).

Fake-quant only (cast + int32-accumulating convs + rescale); measures the
speed ceiling before building a real quantized path.

    python scripts/probe_int8.py [--batch 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pipelined(f, args_, iters=10, depth=4, warmup=2):
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

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    B = args.batch
    x = jnp.asarray(rng.rand(B, 256, 1836, 3).astype(np.float32)).astype(jnp.bfloat16)
    ws = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1).astype(jnp.bfloat16)
          for s in [(3, 3, 3, 32), (32,), (3, 3, 32, 32), (32,),
                    (3, 3, 32, 32), (32,)]]
    w1, b1, w2, b2, w3, b3 = ws

    def conv(v, wt, stride, ptype=None):
        return lax.conv_general_dilated(
            v, wt, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype)

    def trunk_bf16(x):
        y = jax.nn.relu(conv(x, w1, 1) + b1)
        y = jax.nn.relu(conv(y, w2, 1) + b2)
        y = jax.nn.relu(conv(y, w3, 2) + b3)
        return y, jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))

    # int8 fake-quant: scale to +-127, conv in int8 -> int32, rescale to bf16
    def q8(v, scale):
        return jnp.clip(jnp.round(v.astype(jnp.float32) * scale), -127, 127).astype(jnp.int8)

    w1q, w2q, w3q = q8(w1, 127.0), q8(w2, 127.0), q8(w3, 127.0)

    def trunk_int8(x):
        xq = q8(x, 127.0)
        y = conv(xq, w1q, 1, jnp.int32)
        y = jax.nn.relu(y.astype(jnp.bfloat16) * (1.0 / (127 * 127)) + b1)
        yq = q8(y, 32.0)
        y = conv(yq, w2q, 1, jnp.int32)
        y = jax.nn.relu(y.astype(jnp.bfloat16) * (1.0 / (32 * 127)) + b2)
        yq = q8(y, 32.0)
        y = conv(yq, w3q, 2, jnp.int32)
        y = jax.nn.relu(y.astype(jnp.bfloat16) * (1.0 / (32 * 127)) + b3)
        return y, jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))

    for name, f in [("bf16", trunk_bf16), ("int8", trunk_int8)]:
        fj = jax.jit(f)
        dt = pipelined(fj, (x,))
        print(f"{name}: {dt*1e3:8.2f} ms/batch  {B/dt:8.1f} scenes/s", flush=True)


if __name__ == "__main__":
    main()
