"""Layout-aligned synthetic box painting (data/synthetic.paint_layout_rect).

The round-3 detection gate failed (45 epochs, val_ats 0.0) because painted
evidence landed at layout positions unrelated to the GT pixel AABBs — an
unlearnable task for a local-receptive-field detector (VERDICT r3 item 1).
These tests pin the fix: painting through the inverse layout transform puts
the color exactly at the target rect of ops.maps.layout_images_as_map, and a
generated painted dataset shows the category color at every GT box AABB in
the layout image the detector actually sees.
"""
import numpy as np
import pytest

from driving_dirty_tpu.data.synthetic import (
    _CATEGORY_COLORS,
    generate,
    paint_layout_rect,
)
from driving_dirty_tpu.data.dataset import IMAGE_H, IMAGE_W
from driving_dirty_tpu.ops.maps import layout_images_as_map


def _layout_of(views):
    import jax.numpy as jnp

    x = jnp.asarray(np.stack(views)[None])  # [1, 6, H, W, 3]
    return np.asarray(layout_images_as_map(x))[0]  # [800, 800, 3]


@pytest.mark.parametrize(
    "rect",
    [
        (120, 80, 180, 140),    # inside BL tile
        (500, 60, 560, 120),    # inside FL tile
        (150, 300, 210, 380),   # inside B tile (ccw-rotated view)
        (520, 320, 600, 420),   # F tile, crosses into row 2 (FR tile)
        (100, 600, 160, 700),   # BR tile (flipped view)
        (380, 250, 430, 300),   # spans the BL/FL column seam and B row
    ],
)
def test_paint_lands_on_layout_rect(rect):
    views = [np.zeros((IMAGE_H, IMAGE_W, 3), np.float64) for _ in range(6)]
    x0, y0, x1, y1 = rect
    paint_layout_rect(views, x0, y0, x1, y1, np.array([1.0, 0.0, 0.0]))
    out = _layout_of(views)
    # interior of the rect (2px margin absorbs bilinear-resize edge blur)
    inner = out[y0 + 3 : y1 - 3, x0 + 3 : x1 - 3]
    assert inner.size > 0
    assert inner[..., 0].min() > 0.5, "red channel missing inside target rect"
    assert inner[..., 1].max() < 0.3, "green bled inside target rect"
    # well outside the rect stays black
    far = np.ones((800, 800), bool)
    far[max(0, y0 - 6) : y1 + 6, max(0, x0 - 6) : x1 + 6] = False
    assert out[far].max() < 0.2, "paint leaked far outside the target rect"


def test_generated_dataset_has_evidence_at_gt_aabbs(tmp_path):
    """End-to-end: painted dataset -> loader -> layout image has the category
    color inside every GT AABB (the correspondence the detector must learn)."""
    import jax.numpy as jnp

    from driving_dirty_tpu.data.dataset import LabeledDataset
    from driving_dirty_tpu.ops.coords import corners_to_aabb

    root = generate(
        str(tmp_path / "d"), scenes=1, samples=3, labeled_scenes=1, seed=7,
        fixed_road=True, structured=True, paint_boxes=True,
    )
    import os

    ds = LabeledDataset(root, os.path.join(root, "annotation.csv"),
                        scene_index=[106], samples_per_scene=3)
    checked = 0
    for i in range(len(ds)):
        item = ds[i]
        imgs = np.asarray(item["images"], np.float32)
        if imgs.dtype != np.float32 or imgs.max() > 1.5:
            imgs = imgs.astype(np.float32) / 255.0
        out = np.asarray(layout_images_as_map(jnp.asarray(imgs[None])))[0]
        aabbs = np.asarray(corners_to_aabb(jnp.asarray(item["boxes"])))
        valid = np.asarray(item["box_valid"])
        cats = np.asarray(item["categories"])
        for j in np.where(valid)[0]:
            x0, y0, x1, y1 = aabbs[j]
            xi0, yi0 = int(np.floor(x0)) + 3, int(np.floor(y0)) + 3
            xi1, yi1 = int(np.ceil(x1)) - 3, int(np.ceil(y1)) - 3
            if xi1 - xi0 < 2 or yi1 - yi0 < 2:
                continue  # box too small for an interior sample
            inner = out[yi0:yi1, xi0:xi1]
            color = _CATEGORY_COLORS[int(cats[j]) - 1]
            # center-of-mass color should be near the category color; other
            # boxes may overlap, so use a generous tolerance on the mean
            err = np.abs(inner.reshape(-1, 3).mean(0) - color).max()
            assert err < 0.45, (i, j, cats[j], inner.reshape(-1, 3).mean(0), color)
            assert int(cats[j]) >= 1, "painted datasets must not emit category 0"
            checked += 1
    assert checked >= 3, "test exercised too few boxes"
