"""Roadmap checkpoint inference — the documented `run_test.py` entry point.

The reference README documents `cd src/utils && python run_test.py
--rm_ckpt_path '../../checkpoints/rm.ckpt'` (/root/reference/README.md:33-37)
but the file is absent from the snapshot (SURVEY.md L7); this implements the
documented surface: restore a roadmap checkpoint, iterate scenes, predict
800x800 masks (stitch -> encoder -> head -> sigmoid -> threshold 0.5), score
the threat metric against ground truth when available, and report
scenes/sec/chip — the primary benchmark config (BASELINE.json config 1).

    python -m driving_dirty_tpu.cli.run_test --rm_ckpt_path <ckpt> \
        --link <data> [--batch_size 1] [--out masks.npz]

Accepts framework .ckpt checkpoints AND original PyTorch Lightning rm.ckpt
files (auto-detected and imported in-memory via checkpoints.torch_import),
so the reference's documented invocation works verbatim on its own artifact.
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
from driving_dirty_tpu.metrics.threat import ts_road_map
from driving_dirty_tpu.models.roadmap import RoadMapBCEv2


def load_roadmap_model(ckpt_path, precision=None):
    try:
        blob = ckpt_io.load(ckpt_path)
        if not blob["params"]:
            raise ValueError("no params in npz — not a framework checkpoint")
        raw_params, raw_state = blob["params"], blob.get("state")
        hparams = dict(blob["hparams"] or {})
    except Exception:
        # Original PyTorch Lightning rm.ckpt (/root/reference/README.md:36):
        # import the torch naming scheme in-memory (checkpoints/torch_import.py)
        from driving_dirty_tpu.checkpoints.torch_import import import_roadmap

        raw_params, raw_state, th = import_roadmap(ckpt_path)
        hparams = {k: v for k, v in dict(th).items()
                   if isinstance(v, (int, float, str, bool))}
        hparams.setdefault("ae_latent_dim", int(raw_params["fc1"]["w"].shape[0]))
        hparams.setdefault("ae_hidden_dim",
                           int(raw_params["encoder"]["fc_z_out"]["w"].shape[0]))
    hparams.setdefault("pretrained_path", None)
    if precision is not None:
        hparams["precision"] = precision
    task = RoadMapBCEv2(hparams)
    params = jax.tree.map(jnp.asarray, raw_params)
    state = jax.tree.map(jnp.asarray, raw_state) if raw_state else task.init(jax.random.PRNGKey(0))[1]
    return task, params, state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rm_ckpt_path", type=str, required=True)
    ap.add_argument("--link", type=str, default="/scratch/ab8690/DLSP20Dataset/data")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--samples_per_scene", type=int, default=NUM_SAMPLE_PER_SCENE)
    ap.add_argument("--num_labeled_scenes", type=int, default=len(LABELED_SCENES))
    ap.add_argument("--limit_batches", type=int, default=None)
    ap.add_argument("--out", type=str, default=None, help="npz path for predicted masks")
    ap.add_argument("--precision", type=int, default=None, choices=[8, 16, 32],
                    help="override checkpoint precision; 8 = int8 trunk "
                         "(ops/quant.py, ~+11%% throughput, >99%% mask agreement)")
    args = ap.parse_args(argv)

    from driving_dirty_tpu.cli.common import honor_platform_env

    honor_platform_env()

    task, params, state = load_roadmap_model(args.rm_ckpt_path, args.precision)
    predict = jax.jit(lambda p, s, x: task.predict(p, s, x))

    ds = LabeledDataset(
        args.link,
        f"{args.link}/annotation.csv",
        LABELED_SCENES[: args.num_labeled_scenes],
        samples_per_scene=args.samples_per_scene,
        raw_uint8=True,
    )
    loader = Loader(ds, args.batch_size, shuffle=False, num_workers=4)

    # int8: calibrate activation scales EAGERLY on the first real batch so
    # they trace as constants (inside the jit they would fall back to the
    # slower dynamic path)
    if task.int8_trunk:
        first, _ = next(iter(loader))
        task.calibrate_int8(params, state, first["images"])

    masks, ts_scores = [], []
    n_scenes = 0
    # warm-up compile outside the timed loop
    dummy = jnp.zeros((args.batch_size, 6, 256, 306, 3), jnp.float32)
    predict(params, state, dummy).block_until_ready()

    t0 = time.perf_counter()
    for i, (batch, bmask) in enumerate(device_prefetch(iter(loader))):
        if args.limit_batches is not None and i >= args.limit_batches:
            break
        pred = predict(params, state, batch["images"])
        for j in range(pred.shape[0]):
            if not bmask[j]:
                continue
            ts_scores.append(float(ts_road_map(batch["road"][j], pred[j])))
            n_scenes += 1
            if args.out:
                masks.append(np.asarray(pred[j], dtype=np.uint8))
    jax.block_until_ready(pred)
    dt = time.perf_counter() - t0

    sps = n_scenes / dt if dt > 0 else 0.0
    avg_ts = float(np.mean(ts_scores)) if ts_scores else float("nan")
    print(f"scenes: {n_scenes}  scenes/sec: {sps:.3f}  avg_ts: {avg_ts:.4f}")
    if args.out and masks:
        np.savez_compressed(args.out, masks=np.stack(masks))
        print(f"masks written to {args.out}")
    return {"scenes_per_sec": sps, "avg_ts": avg_ts, "n_scenes": n_scenes}


if __name__ == "__main__":
    main()
