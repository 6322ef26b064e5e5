"""Probe: int8-RESIDENT inter-layer activations vs the shipped int8 path.

Hypothesis: the shipped path (ops/quant.py encoder_convs_int8) nominally
dequantizes every conv output to bf16 and re-quantizes at the next layer's
input, so hand-fusing the requantization into the conv epilogue
(q_next = clip(round(relu(acc*s + b) * s_next)), all elementwise on the
int32 accumulator) should cut junction HBM traffic from ~6 to ~2
bytes/element.

MEASURED RESULT (v5e, batch 256, trunk-only): NEGATIVE. XLA already fuses
the dequant+bias+relu+next-quantize chain into the conv epilogue on the
shipped path — cost analysis reports identical bytes accessed (12.04
GB/batch = 47 MB/scene) for both, and the hand-fused variant is ~5% slower
(3956 vs 4167 scenes/s; bf16 reference 3535). The int8 trunk is MXU-bound,
not HBM-bound. Kept per the perf-log convention: negative results stay
in-tree, parity-tested.

    python scripts/probe_int8_resident.py [--batch 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pipelined(f, args_, iters=10, depth=8, warmup=2):
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.ops import quant

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    B = args.batch
    x32 = rng.rand(B, 256, 1836, 3).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    params = {
        name: {"w": jnp.asarray(rng.randn(*ws).astype(np.float32) * 0.1),
               "b": jnp.asarray(rng.randn(wb).astype(np.float32) * 0.1)}
        for name, ws, wb in [("c1", (3, 3, 3, 32), 32),
                             ("c2", (3, 3, 32, 32), 32),
                             ("c3", (3, 3, 32, 32), 32)]
    }
    scales = quant.calibrate_trunk(params, jnp.asarray(x32[:8]))
    print("scales:", scales, flush=True)

    def shipped(x):
        y = quant.encoder_convs_int8(params, x, scales=scales)
        return y, jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))

    def resident(x):
        y = quant.encoder_convs_int8_resident(params, x, scales)
        return y, jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))

    def bf16(x):
        def conv(v, p, stride):
            y = lax.conv_general_dilated(
                v, p["w"].astype(v.dtype), (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.relu(y + p["b"].astype(v.dtype))
        y = conv(x, params["c1"], 1)
        y = conv(y, params["c2"], 1)
        y = conv(y, params["c3"], 2)
        return y, jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))

    variants = [("int8_shipped", shipped), ("int8_resident", resident)]
    if B <= 256:  # bf16 f32-temps OOM 16G HBM past batch 256
        variants.insert(0, ("bf16", bf16))
    outs = {}
    for name, f in variants:
        fj = jax.jit(f)
        y, _ = fj(x)
        outs[name] = np.asarray(y[:2], np.float32)
        dt = pipelined(fj, (x,), iters=args.iters)
        print(f"{name}: {dt*1e3:8.2f} ms/batch  {B/dt:8.1f} scenes/s", flush=True)

    ref = outs["int8_shipped"]
    new = outs["int8_resident"]
    rel = np.abs(new - ref).max() / (np.abs(ref).max() + 1e-8)
    print(f"resident vs shipped max rel err: {rel:.3e}")
    if "bf16" in outs:
        fref = outs["bf16"]
        for k in ("int8_shipped", "int8_resident"):
            rel = np.abs(outs[k] - fref).max() / (np.abs(fref).max() + 1e-8)
            print(f"{k} vs bf16 max rel err: {rel:.3e}")


if __name__ == "__main__":
    main()
