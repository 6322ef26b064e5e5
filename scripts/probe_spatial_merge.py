"""Probe: where does spatial_rm eval time go, and does an int8 merge head win?

VERDICT r1 item 5 suggested int8 for the spatial merge head ("at 209 scenes/s
it is the slowest non-detection eval path and is conv-dominated like the
trunk"). This probe stage-bisects the spatial_rm forward at real shapes and
measures a fake-quant int8 variant of the RoadMapBoxesMergingCNN upsample
stack (the analog of scripts/probe_int8.py for the trunk).

Stages (batch 32 bf16, the bench_all config):
  full        SpatialMappingCNN + encoder c3 + merge head (the model forward)
  space_map   per-view convs + BEV grid only
  trunk       encoder c3 tap only (pano 256x1836)
  merge       RoadMapBoxesMergingCNN only (bf16)
  merge_int8  same, activations+weights int8, int32 accumulation, static scales

    python scripts/probe_spatial_merge.py [--batch 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pipelined(f, args_, iters=10, depth=4, warmup=2):
    for _ in range(warmup):
        float(f(*args_))
    inflight = []
    t0 = time.perf_counter()
    for _ in range(iters):
        inflight.append(f(*args_))
        if len(inflight) > depth:
            float(inflight.pop(0))
    for d in inflight:
        float(d)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.nn.autoencoder import Encoder
    from driving_dirty_tpu.nn.spatial import RoadMapBoxesMergingCNN, SpatialMappingCNN

    enable_compilation_cache()
    B = args.batch
    cdt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    enc = Encoder(hidden_dim=128, latent_dim=128, input_height=256, input_width=1836)
    sp = SpatialMappingCNN()
    mg = RoadMapBoxesMergingCNN()
    k1, k2, k3 = jax.random.split(key, 3)
    enc_p, enc_s = enc.init(k1)
    sp_p, _ = sp.init(k2)
    mg_p, _ = mg.init(k3)

    views = jnp.asarray(rng.rand(B, 6, 256, 306, 3).astype(np.float32)).astype(cdt)
    pano = jnp.asarray(rng.rand(B, 256, 1836, 3).astype(np.float32)).astype(cdt)
    ssr = jnp.asarray(rng.rand(B, 128, 918, 32).astype(np.float32)).astype(cdt)
    spatial = jnp.asarray(rng.rand(B, 256, 256, 32).astype(np.float32)).astype(cdt)
    rm = jnp.asarray((rng.rand(B, 800, 800, 1) > 0.5).astype(np.float32)).astype(cdt)

    def digest(y):
        return jnp.sum(y[:, ::97, ::97].astype(jnp.float32))

    def full(views, rm):
        s, _ = sp.apply(sp_p, {}, views)
        wide = jnp.concatenate(
            [views[:, i] for i in (0, 1, 2, 5, 4, 3)], axis=2)
        c3, _ = enc.apply(enc_p, enc_s, wide, train=False, rng=None, c3_only=True)
        y, _ = mg.apply(mg_p, {}, c3, s, rm)
        return digest(y)

    def space_map(views, rm):
        s, _ = sp.apply(sp_p, {}, views)
        return digest(s)

    def trunk(pano, rm):
        c3, _ = enc.apply(enc_p, enc_s, pano, train=False, rng=None, c3_only=True)
        return digest(c3)

    def merge(ssr_, spatial_, rm_):
        y, _ = mg.apply(mg_p, {}, ssr_, spatial_, rm_)
        return digest(y)

    # ---- int8 merge head (fake-quant, static per-tensor activation scales;
    # real path would calibrate like ops.quant.calibrate_trunk) -------------
    def q8(v, scale):
        return jnp.clip(jnp.round(v.astype(jnp.float32) * scale), -127, 127).astype(jnp.int8)

    def qw(w):
        s = 127.0 / jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2), keepdims=True), 1e-8)
        return q8(w, s), (1.0 / s).reshape(-1)

    def conv_i8(xq, wq, stride, pad):
        return lax.conv_general_dilated(
            xq, wq, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def convT_i8(xq, wq, k, stride=1, pad=0, opad=0, dil=1):
        w = jnp.flip(wq, axis=(0, 1))
        lo = dil * (k - 1) - pad
        return lax.conv_general_dilated(
            xq, w, (1, 1), ((lo, lo + opad), (lo, lo + opad)),
            lhs_dilation=(stride, stride), rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    S_ACT = 16.0  # static per-tensor activation scale (relu outputs ~[0, 8))

    def merge_int8(ssr_, spatial_, rm_):
        relu = jax.nn.relu
        p = mg_p

        def deq(acc, w_inv, b, s_in):
            return relu(acc.astype(jnp.float32) * (w_inv / s_in) + b.astype(jnp.float32)).astype(cdt)

        # ss branch: Conv(32,32,(1,24),(1,7)) + ConvT(32,32,2,2)
        w, winv = qw(p["ss_conv"]["w"])
        x = lax.conv_general_dilated(
            q8(ssr_, S_ACT), w, (1, 7), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32)
        x = deq(x, winv, p["ss_conv"]["b"], S_ACT)
        w, winv = qw(p["ss_deconv"]["w"])
        x = deq(convT_i8(q8(x, S_ACT), w, 2, stride=2), winv, p["ss_deconv"]["b"], S_ACT)
        # rm branch: Conv(1,32,7,3,1,d3) + Conv(32,32,3,1,0,d3)
        w, winv = qw(p["rm_conv_1"]["w"])
        r = lax.conv_general_dilated(
            q8(rm_, 127.0), w, (3, 3), ((1, 1), (1, 1)), rhs_dilation=(3, 3),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32)
        r = deq(r, winv, p["rm_conv_1"]["b"], 127.0)
        w, winv = qw(p["rm_conv_2"]["w"])
        r = lax.conv_general_dilated(
            q8(r, S_ACT), w, (1, 1), ((0, 0), (0, 0)), rhs_dilation=(3, 3),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32)
        r = deq(r, winv, p["rm_conv_2"]["b"], S_ACT)
        x = jnp.concatenate([x, spatial_, r], axis=-1)
        # up_conv_1..4: ConvT(k7, d7/d7/d7/d3), then up_conv_5 ConvT(k2,s2)
        for i, dil in ((1, 7), (2, 7), (3, 7), (4, 3)):
            w, winv = qw(p[f"up_conv_{i}"]["w"])
            x = deq(convT_i8(q8(x, S_ACT), w, 7, dil=dil), winv, p[f"up_conv_{i}"]["b"], S_ACT)
        w, winv = qw(p["up_conv_5"]["w"])
        y = convT_i8(q8(x, S_ACT), w, 2, stride=2).astype(jnp.float32) * (winv / S_ACT)
        y = jax.nn.sigmoid(y + p["up_conv_5"]["b"].astype(jnp.float32))
        return digest(y)

    cases = [
        ("full", full, (views, rm)),
        ("space_map", space_map, (views, rm)),
        ("trunk", trunk, (pano, rm)),
        ("merge_bf16", merge, (ssr, spatial, rm)),
        ("merge_int8", merge_int8, (ssr, spatial, rm)),
    ]
    for name, f, a in cases:
        fj = jax.jit(f)
        dt = pipelined(fj, a)
        print(f"{name:12s}: {dt*1e3:8.2f} ms/batch  {B/dt:8.1f} scenes/s", flush=True)


if __name__ == "__main__":
    main()
