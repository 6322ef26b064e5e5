"""Coordinate transforms between BEV world meters and 800x800 pixel space.

World coordinates are meters in (-40, 40)^2 around the ego car; pixel space is
(0, 800)^2 with `px = m * 10 + 400` and the y axis flipped
(/root/reference/src/utils/helper.py:28-31,
 /root/reference/src/bounding_box_model/fast_rcnn/bb_fast_rcnn_w_map.py:183-235).

Box tensors follow the dataset convention [..., 2, 4]: row 0 = x coordinates,
row 1 = y coordinates, corner order [fl, fr, bl, br]
(/root/reference/src/utils/data_helper.py:118,129).

Everything here is pure jnp, shape-polymorphic over leading axes, and used
both host-side (metrics) and device-side (detection targets).
"""
from __future__ import annotations

import jax.numpy as jnp

MAP_SIZE = 800
PX_PER_METER = 10.0
CENTER = 400.0


def meters_to_pixels(xy, flip_y: bool = True):
    """Scale meter coords to pixel coords. xy: [..., 2, 4] (row 0 x, row 1 y)."""
    x = xy[..., 0, :] * PX_PER_METER + CENTER
    ysign = -PX_PER_METER if flip_y else PX_PER_METER
    y = xy[..., 1, :] * ysign + CENTER
    return jnp.stack([x, y], axis=-2)


def corners_to_aabb(boxes_m, flip_y: bool = True):
    """[..., 2, 4] meter-space corners -> [..., 4] pixel AABB [x0, y0, x1, y1].

    Mirrors `_old_to_new_coord`
    (/root/reference/src/bounding_box_model/fast_rcnn/bb_fast_rcnn_w_map.py:217-235):
    scale each corner to pixels (y flipped), then take min/max per axis.
    """
    px = meters_to_pixels(boxes_m, flip_y=flip_y)
    x0 = jnp.min(px[..., 0, :], axis=-1)
    x1 = jnp.max(px[..., 0, :], axis=-1)
    y0 = jnp.min(px[..., 1, :], axis=-1)
    y1 = jnp.max(px[..., 1, :], axis=-1)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def aabb_to_corners(aabb_px, flip_y: bool = True):
    """[..., 4] pixel AABB -> [..., 2, 4] meter corners [fl, fr, bl, br].

    Mirrors `_new_to_old_coord`
    (/root/reference/src/bounding_box_model/fast_rcnn/bb_fast_rcnn_w_map.py:183-215):
    fl=(x1,y1), fr=(x1,y0), bl=(x0,y1), br=(x0,y0) after unscaling.
    """
    x0 = (aabb_px[..., 0] - CENTER) / PX_PER_METER
    x1 = (aabb_px[..., 2] - CENTER) / PX_PER_METER
    ydiv = -PX_PER_METER if flip_y else PX_PER_METER
    y0 = (aabb_px[..., 1] - CENTER) / ydiv
    y1 = (aabb_px[..., 3] - CENTER) / ydiv
    xs = jnp.stack([x1, x1, x0, x0], axis=-1)
    ys = jnp.stack([y1, y0, y1, y0], axis=-1)
    return jnp.stack([xs, ys], axis=-2)
