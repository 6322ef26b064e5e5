"""Conv roofline probe: what TF/s does XLA:TPU achieve per trunk shape?

    python scripts/probe_conv_roof.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

rng = np.random.RandomState(0)
ITERS = 10


def bench(name, fn, *args, flops=0, bytes_=0):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = f(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    tf = flops / dt / 1e12
    gb = bytes_ / dt / 1e9
    print(f"{name:34s}: {dt*1e3:7.2f} ms  {tf:7.1f} TF/s  {gb:7.0f} GB/s", flush=True)


def conv(x, w, stride=1, pad=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def t(shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.rand(*shape).astype(np.float32) - 0.5, dtype)


B = 16
# reference-peak matmul
m = t((8192, 8192)); n = t((8192, 8192))
bench("matmul 8k^3 bf16", lambda a, b: a @ b, m, n,
      flops=2 * 8192**3, bytes_=3 * 2 * 8192**2)

x1 = t((B, 800, 800, 3));   w1 = t((3, 3, 3, 32))
x2 = t((B, 800, 800, 32));  w2 = t((3, 3, 32, 32))
w3 = t((3, 3, 32, 32))
x4 = t((B, 400, 400, 128)); w4 = t((3, 3, 128, 128))
x5 = t((B, 400, 400, 32));  w5 = t((3, 3, 32, 32))
x6 = t((B, 400, 400, 256)); w6 = t((3, 3, 256, 256))

bench("conv1 3->32 800^2", conv, x1, w1,
      flops=2 * B * 640000 * 27 * 32, bytes_=2 * B * 640000 * (3 + 32))
bench("conv2 32->32 800^2", conv, x2, w2,
      flops=2 * B * 640000 * 288 * 32, bytes_=2 * B * 640000 * 64)
bench("conv3 32->32 800^2 s2", lambda x, w: conv(x, w, stride=2), x2, w3,
      flops=2 * B * 160000 * 288 * 32, bytes_=2 * B * (640000 * 32 + 160000 * 32))
bench("conv 32->32 400^2 (rpn head)", conv, x5, w5,
      flops=2 * B * 160000 * 288 * 32, bytes_=2 * B * 160000 * 64)
bench("conv 128->128 400^2", conv, x4, w4,
      flops=2 * B * 160000 * 1152 * 128, bytes_=2 * B * 160000 * 256)
bench("conv 256->256 400^2", conv, x6, w6,
      flops=2 * B * 160000 * 2304 * 256, bytes_=2 * B * 160000 * 512)

# f32 vs bf16 on conv2
x2f = x2.astype(jnp.float32); w2f = w2.astype(jnp.float32)
bench("conv2 f32", conv, x2f, w2f,
      flops=2 * B * 640000 * 288 * 32, bytes_=4 * B * 640000 * 64)

# dot_general im2col-ish: [BHW, 288] x [288, 32] at conv2 flops (pre-shifted
# input is fake here; just measures the matmul shape's efficiency)
a = t((B * 640000 // 8, 288)); b_ = t((288, 32))
bench("matmul [1.28M,288]x[288,32]", lambda a, b: a @ b, a, b_,
      flops=2 * a.shape[0] * 288 * 32, bytes_=2 * a.shape[0] * (288 + 32))
a2 = t((B * 640000 // 8, 288)); b2 = t((288, 128))
bench("matmul [1.28M,288]x[288,128]", lambda a, b: a @ b, a2, b2,
      flops=2 * a2.shape[0] * 288 * 128, bytes_=2 * a2.shape[0] * (288 + 128))
