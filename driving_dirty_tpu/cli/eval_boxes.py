"""Evaluate a bounding-box model checkpoint: average threat score over scenes.

Completes the box-metric story the reference left commented out
(/root/reference/src/bounding_box_model/fast_rcnn/bb_fast_rcnn_w_map.py:139-154):
restore a faster_rcnn[_rm] checkpoint, run fixed-shape detection inference,
convert pixel AABBs back to meter-space corner boxes
(ops.coords.aabb_to_corners == the reference's _new_to_old_coord), and score
`compute_ats_bounding_boxes` (metrics.threat, helper.py:33-72 parity) against
ground truth, host-side via the native C++ IoU kernel.

    python -m driving_dirty_tpu.cli.eval_boxes --ckpt_path <ckpt> --link <data>
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from driving_dirty_tpu.checkpoints import io as ckpt_io
from driving_dirty_tpu.data.dataset import LABELED_SCENES, NUM_SAMPLE_PER_SCENE, LabeledDataset
from driving_dirty_tpu.data.pipeline import Loader, device_prefetch
from driving_dirty_tpu.metrics.threat import ats_bounding_boxes
from driving_dirty_tpu.models.faster_rcnn import BBFasterRCNN, FasterRCNNRoadMap
from driving_dirty_tpu.ops.coords import aabb_to_corners

TASKS = {"faster_rcnn": BBFasterRCNN, "faster_rcnn_rm": FasterRCNNRoadMap}


def load_detection_task(ckpt_path, precision=None):
    """Checkpoint -> (task, params, state) for the detection families.
    Shared by this CLI and the .ddx exporter (driving_dirty_tpu/export.py)."""
    blob = ckpt_io.load(ckpt_path)
    task_name = blob["meta"].get("task", "faster_rcnn_rm")
    hparams = dict(blob["hparams"] or {})
    hparams.setdefault("pretrained_path", None)
    if precision is not None:
        hparams["precision"] = precision
    task = TASKS[task_name](hparams)
    params = jax.tree.map(jnp.asarray, blob["params"])
    state = (jax.tree.map(jnp.asarray, blob["state"]) if blob.get("state")
             else task.init(jax.random.PRNGKey(0))[1])
    return task, params, state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--link", type=str, default="/scratch/ab8690/DLSP20Dataset/data")
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--samples_per_scene", type=int, default=NUM_SAMPLE_PER_SCENE)
    ap.add_argument("--num_labeled_scenes", type=int, default=len(LABELED_SCENES))
    ap.add_argument("--limit_batches", type=int, default=None)
    ap.add_argument("--score_thresh", type=float, default=0.5,
                    help="minimum detection score to count a box")
    ap.add_argument("--precision", type=int, default=None, choices=[8, 16, 32],
                    help="override checkpoint precision; 8 = int8 c3 trunk "
                         "(statically calibrated on the first batch)")
    args = ap.parse_args(argv)

    from driving_dirty_tpu.cli.common import honor_platform_env

    honor_platform_env()

    task, params, state = load_detection_task(args.ckpt_path, args.precision)

    predict = jax.jit(
        lambda p, s, im, rd: task.predict(p, s, im, rd if task.uses_roadmap else None)
    )

    ds = LabeledDataset(
        args.link, f"{args.link}/annotation.csv",
        LABELED_SCENES[: args.num_labeled_scenes],
        samples_per_scene=args.samples_per_scene,
        raw_uint8=True,
    )
    loader = Loader(ds, args.batch_size, shuffle=False, num_workers=4)

    if task.int8_trunk:
        # static scales must bake in before tracing (see quant.py header)
        first, _ = next(iter(loader))
        task.calibrate_int8(params, state, first["images"], first.get("road"))

    scores, n_scenes = [], 0
    t0 = time.perf_counter()
    for i, (batch, bmask) in enumerate(device_prefetch(iter(loader))):
        if args.limit_batches is not None and i >= args.limit_batches:
            break
        dets = predict(params, state, batch["images"], batch["road"])
        boxes_m = np.asarray(aabb_to_corners(dets["boxes"]))  # [b, D, 2, 4]
        valid = np.asarray(dets["valid"]) & (np.asarray(dets["scores"]) > args.score_thresh)
        gt = np.asarray(batch["boxes"])
        gt_valid = np.asarray(batch["box_valid"])
        for j in range(boxes_m.shape[0]):
            if not bmask[j]:
                continue
            n_scenes += 1
            pred_j = boxes_m[j][valid[j]]
            gt_j = gt[j][gt_valid[j]]
            if len(gt_j) == 0:
                continue
            scores.append(float(ats_bounding_boxes(pred_j, gt_j)))
    dt = time.perf_counter() - t0
    avg = float(np.mean(scores)) if scores else 0.0
    print(f"scenes: {n_scenes}  scenes/sec: {n_scenes / dt:.3f}  avg_box_ts: {avg:.4f}")
    return {"avg_box_ts": avg, "n_scenes": n_scenes, "scenes_per_sec": n_scenes / dt if dt else 0}


if __name__ == "__main__":
    main()
