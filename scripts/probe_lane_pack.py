"""Lane-packing probe for the 32-channel trunk convs.

The encoder trunk (and RPN head) run 3x3 convs with C_out=32 on huge
spatial extents; on the MXU the 32 output channels fill 32/128 lanes.
An exact rewrite packs a 2x2 block of output pixels into channels:
  conv3x3(stride 1, C_out=32)  ==  conv4x4(stride 2, C_out=128) + d2s
where packed kernel [4,4,Cin,128] holds the 3x3 kernel at offset
(dy,dx) for output channel slot (dy,dx,c), zeros elsewhere.
FLOPs x16/9 but lane utilization x4.

    python scripts/probe_lane_pack.py [--batch 16]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    B = args.batch
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(B, 800, 800, 3).astype(np.float32), dtype=jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 32).astype(np.float32) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.05, jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.05, jnp.bfloat16)

    def conv(x, w, stride=1, pad=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pack_w(w):
        # [3,3,Cin,Cout] -> [4,4,Cin,4*Cout]; slot (dy,dx): kernel at rows
        # dy..dy+2, cols dx..dx+2
        k, _, cin, cout = w.shape
        out = jnp.zeros((4, 4, cin, 4 * cout), w.dtype)
        for dy in range(2):
            for dx in range(2):
                sl = (dy * 2 + dx) * cout
                out = out.at[dy:dy + 3, dx:dx + 3, :, sl:sl + cout].set(w)
        return out

    def conv_packed(x, wp, cout):
        # stride-1 3x3 pad-1 conv, 2x2-packed: pad (1,1), k4 s2 -> d2s
        y = lax.conv_general_dilated(
            x, wp, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w_, _ = y.shape
        y = y.reshape(b, h, w_, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h * 2, w_ * 2, cout)

    def trunk_ref(ws, x):
        h = jax.nn.relu(conv(x, ws[0]))
        h = jax.nn.relu(conv(h, ws[1]))
        return jax.nn.relu(conv(h, ws[2], stride=2))

    def trunk_packed(ws, x):
        h = jax.nn.relu(conv_packed(x, pack_w(ws[0]), 32))
        h = jax.nn.relu(conv_packed(h, pack_w(ws[1]), 32))
        return jax.nn.relu(conv(h, ws[2], stride=2))

    def trunk_packed_all(ws, x):
        # keep packed through conv2, fold d2s of conv2 into conv3's stride:
        # conv3 (stride 2) consumes the unpacked h2; equivalently run conv3
        # on d2s output — same as trunk_packed but also packs nothing new.
        return trunk_packed(ws, x)

    ws = [w1, w2, w3]

    def bench(name, fn, grad=False):
        if grad:
            def loss(ws_, x_):
                return jnp.sum(fn(ws_, x_).astype(jnp.float32) ** 2)
            f = jax.jit(jax.grad(loss))
            dig = lambda r: float(jnp.sum(r[1].astype(jnp.float32)))
        else:
            f = jax.jit(fn)
            dig = lambda r: float(jnp.sum(r.astype(jnp.float32)))
        r = f(ws, x0); dig(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(ws, x0)
        dig(r)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:24s}: {dt*1e3:8.2f} ms", flush=True)
        return r

    # correctness
    ra = trunk_ref(ws, x0)
    rb = trunk_packed(ws, x0)
    err = float(jnp.max(jnp.abs(ra.astype(jnp.float32) - rb.astype(jnp.float32))))
    print(f"packed max|diff| = {err:.6f}")

    bench("trunk fwd ref", trunk_ref)
    bench("trunk fwd packed", trunk_packed)
    bench("trunk fwd+bwd ref", trunk_ref, grad=True)
    bench("trunk fwd+bwd packed", trunk_packed, grad=True)


if __name__ == "__main__":
    main()
