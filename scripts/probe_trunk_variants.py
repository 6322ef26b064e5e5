"""Bisect the fused-trunk pallas kernel stage by stage.

Variants (cumulative):
  v0    pass-through: in-block -> out-block copy (grid + IO pipeline floor)
  v1    c1 dot + bias + relu + mask
  v2    v1 + shuffle1 (no c2 dots)
  v3    v1 + c2 dots without shuffle (slices yb1 directly)
  v4    v1 + shuffle1 + c2 dots
  full  production kernel (c1 + shuffle + c2 + shuffle + c3)

    python scripts/probe_trunk_variants.py [--batch 64]
"""
import argparse
import functools
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
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.pallas import trunk as T

    enable_compilation_cache()
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    B = args.batch
    x = jnp.asarray(rng.rand(B, 256, 1836, 3).astype(np.float32)).astype(dt)
    ws = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1).astype(dt)
          for s in [(3, 3, 3, 32), (32,), (3, 3, 32, 32), (32,),
                    (3, 3, 32, 32), (32,)]]
    w1, b1, w2, b2, w3, b3 = ws

    TH, TW, TWIN, nw, hb, wb = 16, 128, 136, 8, 128, 918
    nh, wbp = hb // TH, nw * TW
    C = 32

    w1f = T.block_weights_k3s1(w1).reshape(48, 128).astype(dt)
    wb2 = T._group_reverse_rows(T.block_weights_k3s1(w2)).astype(dt)
    wb3 = T._group_reverse_rows(T.block_weights_k3s2(w3)).astype(dt)
    b1t = jnp.tile(b1, 4).reshape(1, 1, 128).astype(dt)
    b2t = jnp.tile(b2, 4).reshape(1, 1, 128).astype(dt)
    b3t = b3.reshape(1, 1, C).astype(dt)

    def kernel(x1_ref, w1_ref, w2_ref, w3_ref, b1_ref, b2_ref, b3_ref,
               out_ref, *, variant):
        t0 = pl.program_id(1) * TH
        c0 = pl.program_id(2) * TW
        f32 = jnp.float32
        x1 = x1_ref[0, 0, 0][:, : TW + 4, :]
        if variant == "v0":
            out_ref[0] = jnp.broadcast_to(x1[2 : TH + 2, 2 : TW + 2, :C], (TH, TW, C)).astype(dt)
            return
        y = lax.dot_general(x1, w1_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=f32)
        y = jnp.maximum(y + b1_ref[...].astype(f32), 0.0)
        yb1 = T._edge_mask(y, t0 - 2, c0 - 2, hb, wb).astype(dt)
        if variant == "v1":
            out_ref[0] = yb1[2 : TH + 2, 2 : TW + 2, :C]
            return
        if variant in ("v2", "v4", "full"):
            xb2 = T._shuffle(yb1, TH + 3, TW + 3)
        else:
            xb2 = yb1[: TH + 3, : TW + 3, :]
        if variant == "v2":
            out_ref[0] = xb2[1 : TH + 1, 1 : TW + 1, :C]
            return
        acc = None
        for U in (0, 1):
            for V in (0, 1):
                t = lax.dot_general(xb2[U : U + TH + 2, V : V + TW + 2, :],
                                    w2_ref[U, V], (((2,), (0,)), ((), ())),
                                    preferred_element_type=f32)
                acc = t if acc is None else acc + t
        acc = jnp.maximum(acc + b2_ref[...].astype(f32), 0.0)
        yb2 = T._edge_mask(acc, t0 - 1, c0 - 1, hb, wb).astype(dt)
        if variant in ("v3", "v4"):
            out_ref[0] = yb2[1 : TH + 1, 1 : TW + 1, :C]
            return
        xb3 = T._shuffle(yb2, TH + 1, TW + 1)
        acc = None
        for U in (0, 1):
            for V in (0, 1):
                t = lax.dot_general(xb3[U : U + TH, V : V + TW, :],
                                    w3_ref[U, V], (((2,), (0,)), ((), ())),
                                    preferred_element_type=f32)
                acc = t if acc is None else acc + t
        out_ref[0] = jnp.maximum(acc + b3_ref[...].astype(f32), 0.0).astype(dt)

    def make_fn(variant):
        k = functools.partial(kernel, variant=variant)

        def run(x):
            def chunk(xc):
                tiles = T._prep_input(xc, TH, TW, TWIN, nw)
                return pl.pallas_call(
                    k,
                    grid=(xc.shape[0], nh, nw),
                    in_specs=[
                        pl.BlockSpec((1, 1, 1, TH + 4, TWIN, 48),
                                     lambda bi, i, j: (bi, i, j, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
                    out_specs=pl.BlockSpec((1, TH, TW, C),
                                           lambda bi, i, j: (bi, i, j, 0)),
                    out_shape=jax.ShapeDtypeStruct((xc.shape[0], hb, wbp, C), dt),
                )(tiles, w1f, wb2, wb3, b1t, b2t, b3t)

            y = lax.map(chunk, x.reshape(-1, 16, 256, 1836, 3))
            return y, jnp.sum(y[..., ::64, ::64, 0].astype(jnp.float32))

        return jax.jit(run)

    for v in ["v0", "v1", "v2", "v3", "v4", "full"]:
        f = make_fn(v)
        dtv = pipelined(f, (x,))
        print(f"{v:5s}: {dtv*1e3:8.2f} ms/batch  {B/dtv:8.1f} scenes/s", flush=True)


if __name__ == "__main__":
    main()
