"""Fused RoIAlign as a Pallas TPU kernel — EXPERIMENT, measured ~XLA parity.

Motivation: the XLA separable-matmul RoIAlign (ops/detection.py
`_roi_align_fwd_impl`) materializes the row-pass intermediate t = By @ F at
[chunk, out, W, C] in HBM (~3.2 GB of traffic per detection-eval step,
profiled 2026-08-20, scripts/profile_det.py) — an apparent fusion target.

Measured result (scripts/probe_roialign.py, batch 8 x 1000 rois, v5e,
bitwise-identical outputs): XLA 40 ms; this kernel 38-43 ms across three
variants — dense row matmul + micro-matmul column pass (38.4), dense +
VPU-reduce column pass (41.6), per-channel 2D matmuls (58.5). KEEPING THE
INTERMEDIATE IN VMEM DOES NOT WIN because the op is bound by its dense
FLOPs, not the HBM traffic: the row pass contracts all H = 400 feature rows
per output bin when bilinear sampling touches at most 2*sampling_ratio of
them (~100x waste), and the same sparsity is wasted along W in the column
pass. XLA overlaps the HBM traffic with the same wasted FLOPs, so the
bandwidth saving buys nothing.

The formulation that WOULD win — gathering just the <=4 relevant feature
rows per bin from the VMEM-resident slab — is blocked by Mosaic: dynamic
sublane indexing must be provably 8-aligned ("cannot statically prove that
index in dimension 1 is a multiple of 8"), and bilinear row indices are
arbitrary. An 8-row aligned-window + mask workaround pencils out to ~8x the
minimal VPU work, landing back at parity. Kept as a parity-tested
experiment + the record of WHY it does not help (same culture as
pallas/trunk.py); the production paths keep the XLA implementation.

Mosaic constraints that shaped the layout (useful for future kernels):
lane-dim reshapes are unsupported ("infer-vector-layout: unsupported shape
cast"); lane slices must be 128-aligned, hence features pre-flattened to
[B, H, C*Wp] with Wp = ceil(W/128)*128 (lane layout c*Wp + w) built OUTSIDE
the kernel; in-kernel reshapes may only split sublane dims; the 16 MB
scoped-vmem default needs raising via CompilerParams for a resident 13 MB
feature slab (v5e has 128 MiB physical VMEM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROI_BLOCK = 32
LANE = 128


def _kernel(by_ref, f_ref, bx_ref, o_ref, *, out_size, rb, c_n, wp):
    # by_ref (1, RB*out, H); f_ref (1, H, C*Wp); bx_ref (1, RB, out, Wp)
    # o_ref (1, RB, out, out, C)
    by = by_ref[0]                               # (RB*out, H)
    bx = bx_ref[0]                               # (RB, out, Wp)
    # row pass: ONE large MXU matmul for all channels/bins of the block
    t = jax.lax.dot_general(                     # (RB*out, C*Wp)
        by, f_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(f_ref.dtype)
    per_c = []
    for c in range(c_n):                         # static unroll
        t_c = t[:, c * wp:(c + 1) * wp]          # lane slice, 128-aligned
        t3 = t_c.reshape(rb, out_size, wp)       # sublane split: ok
        # column pass on the VPU: a roi-batched [7, Wp] x [7, Wp] lane
        # reduce — NOT c_n*RB micro-matmuls, whose per-call MXU overhead
        # dominated a dot_general formulation of this loop
        o_c = jnp.sum(t3[:, :, None, :] * bx[:, None, :, :], axis=-1)
        per_c.append(o_c)                        # (RB, out_i, out_j)
    o_ref[0] = jnp.stack(per_c, axis=-1).astype(o_ref.dtype)


def roi_align_fused(features_flat, by, bx, *, out_size: int, c_n: int,
                    roi_block: int = ROI_BLOCK, interpret: bool = False):
    """features_flat [B, H, C*Wp] (lane layout c*Wp + w, Wp % 128 == 0),
    by [B, R*out, H] (row-pass bin matrices, flattened), bx [B, R, out, Wp]
    -> [B, R, out, out, C]."""
    b_, h, cwp = features_flat.shape
    wp = cwp // c_n
    assert wp % LANE == 0, wp
    r = bx.shape[1]
    assert by.shape == (b_, r * out_size, h), (by.shape, (b_, r * out_size, h))
    assert bx.shape[3] == wp, (bx.shape, wp)
    assert r % roi_block == 0, (r, roi_block)
    grid = (b_, r // roi_block)
    return pl.pallas_call(
        functools.partial(_kernel, out_size=out_size, rb=roi_block, c_n=c_n,
                          wp=wp),
        out_shape=jax.ShapeDtypeStruct((b_, r, out_size, out_size, c_n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, roi_block * out_size, h),
                         lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, cwp), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, roi_block, out_size, wp),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, roi_block, out_size, out_size, c_n),
            lambda bi, ri: (bi, ri, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        # resident feature slab (13 MB at eval scale) + the t intermediate +
        # double-buffered roi blocks exceed the 16 MB scoped-vmem default;
        # v5e has 128 MiB physical VMEM — raise the compiler cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(by, features_flat, bx)
