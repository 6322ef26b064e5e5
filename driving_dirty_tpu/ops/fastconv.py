"""MXU-shaped "blocked" convolutions for the 32-channel encoder stack.

The reference encoder's convs (/root/reference/src/autoencoder/components.py:
19-21) carry only 32 channels. On TPU the MXU contracts 128-wide lanes, so a
32-out-channel conv wastes 3/4 of every systolic pass. This module rewrites a
k3/s1/p1 conv as an *exactly equivalent* k2 conv over 2x2 space-to-depth
blocks:

    x:[b,H,W,C] --s2d--> [b,H/2+1,W/2+1,4C]  (input shifted by the p1 pad)
    conv k2 valid, weights rearranged (9/16 dense) -> [b,H/2,W/2,4C_out]
    --d2s--> y:[b,H,W,C_out]   == conv_k3_s1_p1(x)

Channel dims become 4*32=128 on both sides of the contraction — full MXU
lanes — at 16/9x the FLOPs. Identical math (same partial products,
reassociated), so outputs match the plain conv to float tolerance; parity is
tested on CPU.

MEASURED RESULT (v5e, roadmap inference, batch 128 bf16): 1077 scenes/s
blocked vs 3122 scenes/s plain — XLA:TPU already performs its own
small-channel conv layout optimizations, and the extra space-to-depth /
depth-to-space HBM traffic plus the 16/9 FLOP overhead loses. Therefore this
path is OFF by default everywhere (`--fast_conv 0`); it is kept as a
correct, tested building block (the weight-rearrangement algebra is reused
nowhere else) and as documentation of the experiment.

Blocked layout convention: channel (s_y*2 + s_x)*C + c holds the pixel at
block offset (s_y, s_x) — offset-major, matching space_to_depth below.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def space_to_depth(x, f: int = 2):
    """[b, H, W, C] -> [b, H/f, W/f, f*f*C], offset-major channel layout."""
    b, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def depth_to_space(y, f: int = 2):
    """Inverse of space_to_depth."""
    b, hb, wb, cc = y.shape
    c = cc // (f * f)
    y = y.reshape(b, hb, wb, f, f, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * f, wb * f, c)


def block_weights_k3s1(w):
    """Rearrange k3/s1/p1 weights [3,3,Cin,Cout] -> blocked k2 weights
    [2,2,4Cin,4Cout].

    Output pixel at block offset (dy,dx) of block (i,j) is original row
    2i+dy, needing input rows 2i+dy+u-1 for taps u in 0..2. Input slot
    (U,sy) of the k2 window holds original row 2(i+U)+sy-1, so tap
    u = 2U+sy-dy contributes when 0<=u<=2 (9 of 16 (U,sy,dy) combos live).
    """
    cin, cout = w.shape[2], w.shape[3]
    wb = jnp.zeros((2, 2, 4 * cin, 4 * cout), w.dtype)
    for U in range(2):
        for V in range(2):
            for sy in range(2):
                for sx in range(2):
                    for dy in range(2):
                        for dx in range(2):
                            u, v = 2 * U + sy - dy, 2 * V + sx - dx
                            if 0 <= u <= 2 and 0 <= v <= 2:
                                si = (sy * 2 + sx) * cin
                                di = (dy * 2 + dx) * cout
                                wb = wb.at[U, V, si : si + cin, di : di + cout].set(
                                    w[u, v]
                                )
    return wb


def block_weights_k3s2(w):
    """Rearrange k3/s2/p1 weights [3,3,Cin,Cout] -> blocked k2 weights
    [2,2,4Cin,Cout] (output is at block resolution already; no output
    blocking). Input slot (U,sy) holds original row 2(i+U)+sy-1; the output
    row i needs taps at rows 2i+u-1, so u = 2U+sy (u=3 dead)."""
    cin, cout = w.shape[2], w.shape[3]
    wb = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for U in range(2):
        for V in range(2):
            for sy in range(2):
                for sx in range(2):
                    u, v = 2 * U + sy, 2 * V + sx
                    if u <= 2 and v <= 2:
                        si = (sy * 2 + sx) * cin
                        wb = wb.at[U, V, si : si + cin, :].set(w[u, v])
    return wb


def _blocked_input(x):
    """Pad by the k3 p1 halo and space-to-depth: [b,H,W,C] ->
    [b,H/2+1,W/2+1,4C] where block (i,j) slot (sy,sx) = x[2i+sy-1, 2j+sx-1]."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return space_to_depth(xp, 2)


def _conv_k2_valid(xb, wb):
    return lax.conv_general_dilated(
        xb,
        wb.astype(xb.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_s1_blocked(x, w, b=None):
    """Exact equivalent of Conv2d(k3, s1, p1) for even H, W."""
    y = _conv_k2_valid(_blocked_input(x), block_weights_k3s1(w))
    if b is not None:
        y = y + jnp.tile(b, 4).astype(y.dtype)
    return depth_to_space(y, 2)


def conv3x3_s2_blocked(x, w, b=None):
    """Exact equivalent of Conv2d(k3, s2, p1) for even H, W."""
    y = _conv_k2_valid(_blocked_input(x), block_weights_k3s2(w))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def encoder_convs_blocked(params, x):
    """Fast-path replacement for the encoder conv trunk (c1->c2->c3 with
    ReLUs; see nn/autoencoder.py Encoder.apply). Returns the c3 feature map.

    c1 and c2 run fully blocked (both channel dims on 128 lanes); c3's
    stride-2 output is at block resolution so only its contraction side
    blocks up (K=512), its 32 output lanes stay as-is.
    """
    x = jax.nn.relu(conv3x3_s1_blocked(x, params["c1"]["w"], params["c1"].get("b")))
    x = jax.nn.relu(conv3x3_s1_blocked(x, params["c2"]["w"], params["c2"].get("b")))
    return jax.nn.relu(conv3x3_s2_blocked(x, params["c3"]["w"], params["c3"].get("b")))
