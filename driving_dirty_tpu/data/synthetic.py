"""Synthetic mini-dataset generator matching the on-disk layout
(SURVEY.md §4.5): random JPEGs + ego.png + annotation.csv, enough to drive
every loader and the end-to-end train->checkpoint->run_test path in tests.

Usage: python -m driving_dirty_tpu.data.synthetic --out /tmp/dd_data \
          [--scenes 2] [--samples 4] [--labeled-scenes 2] [--seed 0]

Scene ids: unlabeled 0..scenes-1; labeled continue from 106 to mirror the real
split boundary (data_helper-style ids are arbitrary ints encoded in dirnames).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from driving_dirty_tpu.data.dataset import IMAGE_H, IMAGE_NAMES, IMAGE_W


def _save_jpeg(path, arr):
    from PIL import Image

    Image.fromarray((arr * 255).astype(np.uint8)).save(path, quality=90)


def _make_scene(root, scene_id, n_samples, rng, labeled, rows, fixed_road=False,
                structured=False, paint_boxes=False):
    for s in range(n_samples):
        d = os.path.join(root, f"scene_{scene_id}", f"sample_{s}")
        os.makedirs(d, exist_ok=True)
        # structured: per-sample global tint + gradient shared by all six
        # views, so the masked view is PREDICTABLE from the other five — the
        # signal the AE pretext task needs to show a real val-MSE drop
        # (pure noise has no cross-view correlation to learn). Box painting
        # is done below per-view; keep the arrays around for it.
        tint = rng.rand(3) * 0.5 if structured else None
        imgs = {}
        for name in IMAGE_NAMES:
            if structured:
                gx = np.linspace(0, 0.4, IMAGE_W)[None, :, None]
                img = tint[None, None, :] + gx + rng.rand(IMAGE_H, IMAGE_W, 3) * 0.08
                img = np.clip(img, 0, 1)
            else:
                img = rng.rand(IMAGE_H, IMAGE_W, 3) * 0.5 + 0.25
            imgs[name] = img
        if labeled:
            from PIL import Image

            ego = np.full((800, 800, 3), 255, np.uint8)
            # fixed_road: deterministic blob so a model can actually FIT the
            # target (the random-position blob is uncorrelated with the noise
            # camera images) — used by the convergence-gate tests
            r0, c0 = (300, 300) if fixed_road else rng.randint(100, 500, 2)
            ego[r0 : r0 + 200, c0 : c0 + 200] = 128  # a road blob (non-white)
            Image.fromarray(ego).save(os.path.join(d, "ego.png"))
            for _ in range(rng.randint(1, 5)):
                cx, cy = rng.uniform(-30, 30, 2)
                w, h = rng.uniform(1, 3), rng.uniform(2, 5)
                ang = rng.uniform(0, np.pi)
                R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
                local = np.array([[+w, +w, -w, -w], [+h, -h, +h, -h]])
                pts = R @ local + np.array([[cx], [cy]])
                rows.append(
                    dict(
                        scene=scene_id,
                        sample=s,
                        category_id=int(rng.randint(0, 9)),
                        action_id=int(rng.randint(0, 4)),
                        fl_x=pts[0, 0], fr_x=pts[0, 1], bl_x=pts[0, 2], br_x=pts[0, 3],
                        fl_y=pts[1, 0], fr_y=pts[1, 1], bl_y=pts[1, 2], br_y=pts[1, 3],
                    )
                )
                if paint_boxes:
                    # paint the box into every view at a position linear in
                    # its BEV center, size proportional to the box — a
                    # deterministic image<->box correspondence the detector
                    # can learn (the pure-noise default gives it nothing).
                    # The layout transform is fixed, so this brightness lands
                    # at a deterministic layout-image location per (cx, cy).
                    px = int((cx + 40.0) / 80.0 * IMAGE_W)
                    py = int((cy + 40.0) / 80.0 * IMAGE_H)
                    hw = max(2, int(w * 3))
                    hh = max(2, int(h * 3))
                    for img in imgs.values():
                        img[max(0, py - hh):py + hh, max(0, px - hw):px + hw, :] = 1.0
        for name, img in imgs.items():
            _save_jpeg(os.path.join(d, name), img)


def generate(out, scenes=2, samples=4, labeled_scenes=2, seed=0, fixed_road=False,
             structured=False, paint_boxes=False):
    import pandas as pd

    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)
    rows: list[dict] = []
    for i in range(scenes):
        _make_scene(out, i, samples, rng, labeled=False, rows=rows,
                    structured=structured)
    for i in range(labeled_scenes):
        _make_scene(out, 106 + i, samples, rng, labeled=True, rows=rows,
                    fixed_road=fixed_road, structured=structured,
                    paint_boxes=paint_boxes)
    pd.DataFrame(rows).to_csv(os.path.join(out, "annotation.csv"), index=False)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--labeled-scenes", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fixed-road", action="store_true",
                    help="deterministic road blob (learnable target for "
                         "convergence runs; random per-sample otherwise)")
    ap.add_argument("--structured", action="store_true",
                    help="cross-view-correlated images (tint+gradient) so the "
                         "AE pretext task has signal to learn")
    ap.add_argument("--paint-boxes", action="store_true",
                    help="paint GT boxes into the camera views so detection "
                         "has an image->box correspondence to learn")
    a = ap.parse_args(argv)
    generate(a.out, a.scenes, a.samples, a.labeled_scenes, a.seed,
             fixed_road=a.fixed_road, structured=a.structured,
             paint_boxes=a.paint_boxes)
    print(f"synthetic dataset written to {a.out}")


if __name__ == "__main__":
    main()
