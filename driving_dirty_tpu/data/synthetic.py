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


def _make_scene(root, scene_id, n_samples, rng, labeled, rows, fixed_road=False):
    for s in range(n_samples):
        d = os.path.join(root, f"scene_{scene_id}", f"sample_{s}")
        os.makedirs(d, exist_ok=True)
        for name in IMAGE_NAMES:
            img = rng.rand(IMAGE_H, IMAGE_W, 3) * 0.5 + 0.25
            _save_jpeg(os.path.join(d, name), img)
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


def generate(out, scenes=2, samples=4, labeled_scenes=2, seed=0, fixed_road=False):
    import pandas as pd

    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)
    rows: list[dict] = []
    for i in range(scenes):
        _make_scene(out, i, samples, rng, labeled=False, rows=rows)
    for i in range(labeled_scenes):
        _make_scene(out, 106 + i, samples, rng, labeled=True, rows=rows,
                    fixed_road=fixed_road)
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
    a = ap.parse_args(argv)
    generate(a.out, a.scenes, a.samples, a.labeled_scenes, a.seed,
             fixed_road=a.fixed_road)
    print(f"synthetic dataset written to {a.out}")


if __name__ == "__main__":
    main()
