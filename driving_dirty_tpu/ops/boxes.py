"""Axis-aligned box utilities for the detection stack (pixel space, xyxy).

Replaces the torchvision box ops the reference pulls in through
`torchvision.models.detection.FasterRCNN`
(/root/reference/src/bounding_box_model/fast_rcnn/bb_fast_rcnn.py:61-72) with
fixed-shape jnp equivalents. All functions broadcast over leading axes and are
jit/vmap-safe; invalid (padded) boxes are handled by the callers' masks.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def area(boxes):
    """[..., 4] xyxy -> [...]."""
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(boxes[..., 3] - boxes[..., 1], 0)


def pairwise_iou(a, b):
    """a: [N, 4], b: [M, 4] -> [N, M] IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a)[:, None] + area(b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode(boxes, anchors, weights=(1.0, 1.0, 1.0, 1.0)):
    """Box regression targets: (dx, dy, dw, dh) of `boxes` w.r.t. `anchors`
    (both [..., 4] xyxy). Standard R-CNN parameterization."""
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha
    w = jnp.clip(boxes[..., 2] - boxes[..., 0], 1e-6)
    h = jnp.clip(boxes[..., 3] - boxes[..., 1], 1e-6)
    x = boxes[..., 0] + 0.5 * w
    y = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    return jnp.stack(
        [
            wx * (x - xa) / jnp.clip(wa, 1e-6),
            wy * (y - ya) / jnp.clip(ha, 1e-6),
            ww * jnp.log(w / jnp.clip(wa, 1e-6)),
            wh * jnp.log(h / jnp.clip(ha, 1e-6)),
        ],
        axis=-1,
    )


def decode(deltas, anchors, weights=(1.0, 1.0, 1.0, 1.0), clip_exp=math.log(1000.0 / 16.0)):
    """Inverse of `encode`. clip_exp = log(1000/16) (torchvision's clamp)."""
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=clip_exp)
    dh = jnp.clip(deltas[..., 3] / wh, max=clip_exp)
    x = dx * wa + xa
    y = dy * ha + ya
    w = jnp.exp(dw) * wa
    h = jnp.exp(dh) * ha
    return jnp.stack([x - 0.5 * w, y - 0.5 * h, x + 0.5 * w, y + 0.5 * h], axis=-1)


def clip_to_image(boxes, size):
    """Clamp xyxy boxes into [0, size]^2."""
    return jnp.clip(boxes, 0.0, float(size))


def smooth_l1(x, beta: float = 1.0 / 9.0):
    """Elementwise smooth-L1 (huber) with torchvision's RPN beta."""
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)
