"""Fused Pallas TPU kernel for the encoder conv trunk (c1 -> c2 -> c3).

The reference trunk (/root/reference/src/autoencoder/components.py:19-21,41-43)
is Conv(3->32,k3,p1)+ReLU -> Conv(32->32,k3,p1)+ReLU -> Conv(32->32,k3,s2,p1)
+ReLU. It is ~99% of roadmap inference time (scripts/probe_split.py), and with
plain XLA convs it is neither MXU- nor HBM-bound: 32-channel contractions use
a quarter of the 128-wide MXU lanes, and each conv round-trips its activation
through HBM (~130 MB/scene).

This kernel combines two ideas, both individually measured before
(ops/fastconv.py header):

  * the *blocked* space-to-depth conv algebra: an exact rewrite of k3 convs as
    k2 convs over 2x2 pixel blocks whose channel dims are 4*32 = 128 — full
    MXU lanes at 16/9 the FLOPs;
  * VMEM residency: all three convs run per (row x col) tile inside one
    pallas_call, so the c1/c2 activations never touch HBM. This removes the
    HBM-traffic penalty that made the XLA-level blocked rewrite *slower*
    (fastconv.py measured 1077 vs 3122 scenes/s).

MEASURED RESULT (v5e, trunk-only, batch 128 bf16, scripts/probe_trunk*.py):
367 scenes/s fused vs 3888 scenes/s plain-XLA — a 10x LOSS, so this path is
OFF by default and kept as a correct, parity-tested negative result. The
stage bisection (scripts/probe_trunk_variants.py, batch 64):

    v0 pass-through   100 ms/batch   <- prep + tile-pipeline IO alone
    v1 +c1 dot        107            <- the 48-channel input blocks DMA at
    v2 +shuffle       114               ~10 GB/s (96-byte HBM lines)
    v3 +c2 dots       153            <- 4-tap f32 accumulate = 4 VPU passes
    full              173               over 1.2MB per tile

Why it loses, quantitatively: XLA's plain path already runs at ~45 TFLOP/s
effective — near the ~49 TFLOP/s ceiling the 32-wide output-channel dim
imposes (32/128 MXU lanes). The blocked rewrite's gains (full lanes) are
paid back by 16/9 FLOP inflation, per-tile halo recompute (~1.3x), the
re-block shuffle + K-group select traffic on the VPU, and sub-128-lane
input IO. Net: the conv trunk at 32 channels is effectively at its
practical speed of light under XLA on this hardware; the remaining lever is
precision (int8 doubles MXU MACs), not kernel authorship.

Data flow per grid step (TH x TW block-coordinates tile, halo +2):

    X1 tile [TH+4, TW+4, 48]      (im2col'd s2d input, prepared by XLA)
      -- dot [48,128] + bias + ReLU + edge-mask -->  yb1 (aligned blocks)
      -- re-block shuffle (4 shifted 32-lane slices) --> xb2 (shifted blocks)
      -- 4-tap k2 dots [128,128] + bias + ReLU + mask --> yb2 (aligned)
      -- re-block shuffle --> xb3
      -- 4-tap k2 dots [128,32] + bias + ReLU --> c3 tile [TH, TW, 32]

"aligned" block form: channel slot (dy,dx) of block (i,j) holds pixel
(2i+dy, 2j+dx). "shifted" form (what a blocked k2 conv consumes, i.e.
space_to_depth of the p1-padded map): slot (sy,sx) of block (i,j) holds pixel
(2i+sy-1, 2j+sx-1). The re-block shuffle between them is
shifted[i,j,(sy,sx)] = aligned[i-1+sy, j-1+sx, (1-sy,1-sx)] — four
row/col-shifted 32-channel-group moves, done in-VMEM where they are cheap.

Edge semantics: out-of-range *aligned* blocks are zero (they are the conv's
zero padding), enforced by masking after each ReLU (bias would otherwise leak
relu(b) into the padding ring).

Training: `fused_trunk` carries a custom VJP whose backward differentiates the
plain-XLA trunk (exact same math), so the kernel is safe under jax.grad at the
cost of one extra XLA forward in the backward pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from driving_dirty_tpu.ops.fastconv import (
    _blocked_input,
    block_weights_k3s1,
    block_weights_k3s2,
)

_C = 32  # trunk channel width (fixed by the reference architecture)


def _pick_tile(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap."""
    for t in range(min(n, cap), 0, -1):
        if n % t == 0:
            return t
    return n


def _group_reverse_rows(wb):
    """Reverse the four 32-row input-slot groups of blocked weights
    [2,2,128,N] (absorbs the shuffle's channel-group permutation)."""
    idx = [(3 - g) * _C + c for g in range(4) for c in range(_C)]
    return wb[:, :, jnp.asarray(idx), :]


def _shuffle(aligned, rows: int, cols: int):
    """Aligned block form -> group-REVERSED shifted block form.

    The true shifted form is shifted[r,c,slot(sy,sx)] =
    aligned[r+sy, c+sx, slot(1-sy,1-sx)]; moving 32-channel groups across
    lanes is expensive on TPU (Mosaic rejects both mixed-lane-offset concats
    and non-32-bit lane rotations). So the kernel computes the group-reversed
    variant instead — shifted'[r,c,group g] = aligned[r+sy, c+sx, group g]
    with (sy,sx) = bits of (3-g) — which needs only *spatial* shifts plus
    lane-group masks; the consuming conv weights have their input-row groups
    reversed to match (_group_reverse_rows). Identical products, relabeled K."""
    lane_group = lax.broadcasted_iota(jnp.int32, (rows, cols, 4 * _C), 2) // _C
    out = None
    for g in range(4):
        sy, sx = (3 - g) >> 1, (3 - g) & 1
        piece = jnp.where(
            lane_group == g,
            aligned[sy : sy + rows, sx : sx + cols, :],
            jnp.zeros((), aligned.dtype),
        )
        out = piece if out is None else out + piece
    return out


def _edge_mask(y, row0: int, col0, hb: int, wb: int):
    """Zero rows/cols whose global block index falls outside [0,hb)x[0,wb).

    row0/col0 are the global indices of local (0, 0) (traced scalars)."""
    r = lax.broadcasted_iota(jnp.int32, y.shape, 0) + row0
    c = lax.broadcasted_iota(jnp.int32, y.shape, 1) + col0
    ok = (r >= 0) & (r < hb) & (c >= 0) & (c < wb)
    return jnp.where(ok, y, jnp.zeros((), y.dtype))


def _compute_tile(x1, w1_ref, w2_ref, w3_ref, b1_ref, b2_ref, b3_ref,
                  out_ref, t0, c0, *, TH: int, TW: int, HB: int, WB: int):
    """The conv math for one tile; x1 is the [TH+4, >=TW+4, 48] input value."""
    cdt = out_ref.dtype
    f32 = jnp.float32

    # ---- c1: one im2col'd matmul, K = 4 taps x 12 = 48, N = 128 ----------
    # Input tiles may be padded wider than TW+4 to satisfy the TPU's
    # 8-sublane block granularity; the pad columns are dropped here and any
    # out-of-range columns are zeroed by the edge mask below.
    x1 = x1[:, : TW + 4, :]  # [TH+4, TW+4, 48]
    y = lax.dot_general(x1, w1_ref[...], (((2,), (0,)), ((), ())),
                        preferred_element_type=f32)
    y = jnp.maximum(y + b1_ref[...].astype(f32), 0.0)
    # local row r <-> global block row t0 - 2 + r
    yb1 = _edge_mask(y, t0 - 2, c0 - 2, HB, WB).astype(cdt)

    # ---- c2: re-block + 4-tap k2, K = N = 128 ----------------------------
    # xb2 local r <-> global t0 - 1 + r; reads yb1 local r + sy.
    xb2 = _shuffle(yb1, TH + 3, TW + 3)
    acc = None
    for U in (0, 1):
        for V in (0, 1):
            t = lax.dot_general(
                xb2[U : U + TH + 2, V : V + TW + 2, :], w2_ref[U, V],
                (((2,), (0,)), ((), ())), preferred_element_type=f32)
            acc = t if acc is None else acc + t
    acc = jnp.maximum(acc + b2_ref[...].astype(f32), 0.0)
    yb2 = _edge_mask(acc, t0 - 1, c0 - 1, HB, WB).astype(cdt)

    # ---- c3: re-block + 4-tap k2 at stride 2, K = 128, N = 32 ------------
    # xb3 local r <-> global t0 + r; reads yb2 local r + sy.
    xb3 = _shuffle(yb2, TH + 1, TW + 1)
    acc = None
    for U in (0, 1):
        for V in (0, 1):
            t = lax.dot_general(
                xb3[U : U + TH, V : V + TW, :], w3_ref[U, V],
                (((2,), (0,)), ((), ())), preferred_element_type=f32)
            acc = t if acc is None else acc + t
    out = jnp.maximum(acc + b3_ref[...].astype(f32), 0.0)
    out_ref[0] = out.astype(cdt)


def _trunk_kernel(x1_ref, w1_ref, w2_ref, w3_ref, b1_ref, b2_ref, b3_ref,
                  out_ref, *, TH: int, TW: int, HB: int, WB: int):
    """Tiles are halo-duplicated in HBM and fed by the automatic pipeline.
    (A manual-DMA variant reading overlapping windows from a non-duplicated
    HBM array was tried and rejected by Mosaic: sliced async copies require
    the minor dim to be 128-lane aligned, and this input is 48-channel.)"""
    t0 = pl.program_id(1) * TH
    c0 = pl.program_id(2) * TW
    _compute_tile(x1_ref[0, 0, 0], w1_ref, w2_ref, w3_ref, b1_ref, b2_ref,
                  b3_ref, out_ref, t0, c0, TH=TH, TW=TW, HB=HB, WB=WB)


def _prep_input(x, TH: int, TW: int, TWIN: int, nw: int):
    """[b, H, W, 3] -> halo-duplicated im2col tiles
    [b, nh, nw, TH+4, TWIN, 48]. Channel order: (U*2+V)*12 + s2d-slot*3 + c,
    matching block_weights_k3s1(w1).reshape(48, 128). TWIN >= TW+4 is the
    (8-sublane-aligned) input tile width; pad columns are zeros."""
    hb, wb = x.shape[1] // 2, x.shape[2] // 2
    xb1 = _blocked_input(x)  # [b, hb+1, wb+1, 12]
    x1 = jnp.concatenate(
        [xb1[:, U : U + hb, V : V + wb, :] for U in (0, 1) for V in (0, 1)],
        axis=-1,
    )
    right = (nw - 1) * TW + TWIN - 2 - wb
    x1p = jnp.pad(x1, ((0, 0), (2, 2), (2, right), (0, 0)))
    nh = hb // TH
    rows = jnp.stack([x1p[:, i * TH : i * TH + TH + 4] for i in range(nh)], 1)
    return jnp.stack(
        [rows[:, :, :, j * TW : j * TW + TWIN] for j in range(nw)], 2
    )


_BATCH_CHUNK = 16  # bound the halo-duplicated prep transients in HBM


def _fused_trunk_fwd_impl(x, w1, b1, w2, b2, w3, b3, *, interpret: bool):
    b, h, w, cin = x.shape
    assert cin == 3 and h % 2 == 0 and w % 2 == 0, (x.shape,)
    hb, wb = h // 2, w // 2
    TH = _pick_tile(hb, 16)
    # Column tiling: TPU block shapes need the sublane (second-to-last) dim
    # divisible by 8 or equal to the full array dim. wb=918 has no /8
    # divisors, so wide maps tile at TW=128 with the output array padded to
    # nw*TW columns (sliced off at the end); narrow maps use one full-width
    # tile (always legal). Full-width tiles at wb=918 blow the 16MB scoped
    # VMEM limit (measured 36.6MB at TH=8), hence the 256 cutoff.
    if wb <= 256:
        TW, nw = wb, 1
        TWIN = TW + 4
    else:
        TW = 128
        nw = -(-wb // TW)
        TWIN = TW + 8  # TW+4 halo, rounded up to the 8-sublane granularity
    wbp = nw * TW
    cdt = x.dtype

    w1f = block_weights_k3s1(w1).reshape(4 * 4 * cin, 4 * _C).astype(cdt)
    wb2 = _group_reverse_rows(block_weights_k3s1(w2)).astype(cdt)
    wb3 = _group_reverse_rows(block_weights_k3s2(w3)).astype(cdt)
    b1t = jnp.tile(b1, 4).reshape(1, 1, 4 * _C).astype(cdt)
    b2t = jnp.tile(b2, 4).reshape(1, 1, 4 * _C).astype(cdt)
    b3t = b3.reshape(1, 1, _C).astype(cdt)

    nh = hb // TH
    kernel = functools.partial(_trunk_kernel, TH=TH, TW=TW, HB=hb, WB=wb)

    def run_chunk(xc):
        tiles = _prep_input(xc, TH, TW, TWIN, nw)
        return pl.pallas_call(
            kernel,
            grid=(xc.shape[0], nh, nw),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, TH + 4, TWIN, 4 * 4 * cin),
                    lambda bi, i, j: (bi, i, j, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(
                (1, TH, TW, _C), lambda bi, i, j: (bi, i, j, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((xc.shape[0], hb, wbp, _C), cdt),
            interpret=interpret,
        )(tiles, w1f, wb2, wb3, b1t, b2t, b3t)

    ch = _pick_tile(b, _BATCH_CHUNK)
    if ch == b:
        out = run_chunk(x)
    else:
        # Sequential batch chunks (lax.map: one compile, bounded transients;
        # the halo-duplicated tile prep would otherwise cost ~1.6x the input
        # in HBM all at once at large batch).
        out = lax.map(run_chunk, x.reshape(b // ch, ch, h, w, cin))
        out = out.reshape(b, hb, wbp, _C)
    return out[:, :, :wb, :] if wbp != wb else out


def xla_trunk(x, w1, b1, w2, b2, w3, b3):
    """Plain-XLA reference of the same trunk (also the VJP path)."""
    def conv(v, wt, bt, stride):
        y = lax.conv_general_dilated(
            v, wt.astype(v.dtype), (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + bt.astype(v.dtype))

    x = conv(x, w1, b1, 1)
    x = conv(x, w2, b2, 1)
    return conv(x, w3, b3, 2)


@jax.custom_vjp
def fused_trunk(x, w1, b1, w2, b2, w3, b3):
    """c1->c2->c3 encoder trunk as one fused Pallas kernel.

    [b, H, W, 3] -> [b, H/2, W/2, 32], H and W even. Identical math to
    xla_trunk (reassociated sums; parity-tested). Runs interpreted off-TPU so
    CPU tests exercise the same code path."""
    interpret = jax.default_backend() != "tpu"
    return _fused_trunk_fwd_impl(x, w1, b1, w2, b2, w3, b3, interpret=interpret)


def _fused_trunk_vjp_fwd(x, w1, b1, w2, b2, w3, b3):
    return fused_trunk(x, w1, b1, w2, b2, w3, b3), (x, w1, b1, w2, b2, w3, b3)


def _fused_trunk_vjp_bwd(res, g):
    _, vjp = jax.vjp(xla_trunk, *res)
    return vjp(g)


fused_trunk.defvjp(_fused_trunk_vjp_fwd, _fused_trunk_vjp_bwd)


def encoder_convs_fused(params, x):
    """Drop-in for the encoder conv trunk (same signature family as
    ops.fastconv.encoder_convs_blocked): params with c1/c2/c3 {w, b}."""
    return fused_trunk(
        x,
        params["c1"]["w"], params["c1"]["b"],
        params["c2"]["w"], params["c2"]["b"],
        params["c3"]["w"], params["c3"]["b"],
    )
