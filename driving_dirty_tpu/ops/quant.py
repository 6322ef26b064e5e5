"""int8 quantized inference for the encoder conv trunk.

The trunk's 32-wide output channels cap bf16 MXU utilization at 32/128 lanes
(~49 TFLOP/s effective ceiling on v5e), and XLA already runs close to that
ceiling (see pallas/trunk.py header for the full accounting). The one lever
left is precision: v5e executes int8 x int8 -> int32 MACs at 2x the bf16
rate. Measured trunk-only (scripts/probe_int8.py, batch 128): 4329 scenes/s
int8 vs 3213 bf16 (+35% — requant passes between layers cost part of the 2x).

Scheme (standard symmetric linear quantization):
  * weights: per-output-channel absmax scales, quantized once per call
    (folded into the jit; weights are tiny);
  * activations: STATIC per-tensor scales from a one-time calibration pass
    (calibrate_trunk) — they become trace-time constants, so the compiled
    program has no reduction in the layer-to-layer dependency chain. A
    dynamic absmax fallback exists (scales=None) but measured 1590 vs 2859
    scenes/s end-to-end: each layer stalls behind a full scalar reduction
    and the f32 intermediates double HBM traffic. Static scales restore the
    probe's +35% (scripts/probe_int8.py).
  * accumulation in int32 (preferred_element_type), dequantized to the
    compute dtype with the combined (act x weight) scale before bias + ReLU;
    inter-layer activations stay in the caller's compute dtype (bf16).

Quality: the 800x800 roadmap output is a thresholded binary mask, so small
logit perturbations only move pixels near the decision boundary;
tests/test_quant.py checks trunk relative error and end-to-end mask
agreement against the float path.

Reference parity note: the reference exposes Lightning's --precision {16,32}
(SURVEY.md §2.8); this module backs the TPU-native extension --precision 8
(inference-only; training stays bf16/f32).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def absmax_scale(x, axis=None, eps=1e-8):
    """Symmetric quant scale q = 127/absmax; axis=None -> per-tensor."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=axis is not None)
    return 127.0 / jnp.maximum(m, eps)


def quantize(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * scale), -127, 127).astype(jnp.int8)


def quantize_conv_weight(w):
    """HWIO weight -> (int8 weight, per-output-channel inverse scale [O])."""
    s = absmax_scale(w, axis=(0, 1, 2))  # [1,1,1,O]
    return quantize(w, s), (1.0 / s).reshape(-1)


def conv2d_int8(xq, wq, x_inv_scale, w_inv_scale, stride=1, padding=1):
    """int8 NHWC conv with int32 accumulation, dequantized to float32.

    xq [b,H,W,Ci] int8, wq [kh,kw,Ci,O] int8; returns float32 [b,H',W',O]
    = conv(x, w) up to quantization error."""
    acc = lax.conv_general_dilated(
        xq, wq, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_inv_scale * w_inv_scale)


def calibrate_trunk(params, x):
    """One float forward over a sample batch -> static activation scales
    (python floats, so they trace as constants) for (input, c1-out, c2-out)."""
    scales = []

    def conv(v, p, stride):
        y = lax.conv_general_dilated(
            v.astype(jnp.float32), p["w"].astype(jnp.float32),
            (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + p["b"].astype(jnp.float32))

    v = x
    for p, stride in ((params["c1"], 1), (params["c2"], 1)):
        scales.append(float(absmax_scale(v)))
        v = conv(v, p, stride)
    scales.append(float(absmax_scale(v)))
    return tuple(scales)


def encoder_convs_int8_resident(params, x, scales):
    """int8 trunk with int8-RESIDENT inter-layer activations.

    Same math as encoder_convs_int8 with static scales, but the next layer's
    requantization is fused into each conv's epilogue:

        q_next = clip(round(relu(acc * (x_inv*w_inv) + b) * s_next))

    — all elementwise on the int32 accumulator, so XLA fuses it into the conv
    output and each intermediate lives in HBM as int8 (~2 bytes/element)
    instead of round-tripping through bf16 (~6 bytes/element: TPU convs
    cannot fuse elementwise producers into their operand reads, so the
    separate quantize() of the shipped path materializes both the bf16 and
    the int8 copy). Requires static calibration scales (the fusion needs the
    next scale as a trace-time constant). Output matches encoder_convs_int8
    up to one removed bf16 rounding (probe: scripts/probe_int8_resident.py).

    NEGATIVE RESULT, kept as the probe target: XLA already performs this
    fusion on the shipped path (identical 47 MB/scene bytes-accessed), and
    this hand-fused version measured ~5% slower. Not used by any model.
    """
    cdt = x.dtype
    s1, s2, s3 = scales
    w1q, w1_inv = quantize_conv_weight(params["c1"]["w"])
    w2q, w2_inv = quantize_conv_weight(params["c2"]["w"])
    w3q, w3_inv = quantize_conv_weight(params["c3"]["w"])

    def conv_q(xq, wq, stride):
        return lax.conv_general_dilated(
            xq, wq, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def epilogue_requant(acc, comb_inv, b, s_next):
        y = jax.nn.relu(acc.astype(jnp.float32) * comb_inv
                        + b.astype(jnp.float32))
        return jnp.clip(jnp.round(y * s_next), -127, 127).astype(jnp.int8)

    xq = quantize(x, s1)
    q = epilogue_requant(conv_q(xq, w1q, 1), (1.0 / s1) * w1_inv,
                         params["c1"]["b"], s2)
    q = epilogue_requant(conv_q(q, w2q, 1), (1.0 / s2) * w2_inv,
                         params["c2"]["b"], s3)
    acc = conv_q(q, w3q, 2)
    y = jax.nn.relu(acc.astype(jnp.float32) * ((1.0 / s3) * w3_inv)
                    + params["c3"]["b"].astype(jnp.float32))
    return y.astype(cdt)


def encoder_convs_int8(params, x, scales=None):
    """int8 drop-in for the encoder conv trunk (c1->c2->c3 with ReLUs,
    /root/reference/src/autoencoder/components.py:19-21,41-43). Returns the
    c3 feature map in x.dtype.

    scales: static (input, c1-out, c2-out) quant scales from calibrate_trunk;
    None falls back to dynamic per-batch absmax (slower, see header).

    HBM note (scripts/probe_int8_resident.py): although this path nominally
    dequantizes each conv output to the compute dtype and re-quantizes at the
    next layer, XLA fuses the dequant+bias+relu+next-quantize chain into the
    conv epilogue, so the inter-layer activation materializes in HBM as int8
    only — cost analysis shows 47 MB/scene for this path AND for a hand-fused
    int8-resident variant (encoder_convs_int8_resident), which measured
    slightly SLOWER (3956 vs 4167 scenes/s trunk-only at batch 256). The
    trunk is MXU-bound at int8, not HBM-bound; keep this formulation."""
    cdt = x.dtype

    def layer(v, p, stride, s):
        wq, w_inv = quantize_conv_weight(p["w"])
        if s is None:
            s = absmax_scale(v)
        y = conv2d_int8(quantize(v, s), wq, 1.0 / s, w_inv, stride=stride)
        return jax.nn.relu(y + p["b"].astype(jnp.float32)).astype(cdt)

    s1, s2, s3 = scales if scales is not None else (None, None, None)
    y = layer(x, params["c1"], 1, s1)
    y = layer(y, params["c2"], 1, s2)
    y = layer(y, params["c3"], 2, s3)
    return y
