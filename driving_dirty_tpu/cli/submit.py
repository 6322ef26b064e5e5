"""Experiment orchestration: model registry + hyperparameter grid fan-out.

Re-design of /root/reference/src/submit.py (SURVEY.md §2.8): the MODEL_NAMES
registry, two-phase parsing keyed on --model, and test-tube's grid-search
fan-out (`optimize_parallel_cluster_gpu`, nb_trials=12). On TPU the fan-out
becomes N independent runs — one per trial — executed sequentially by default
or emitted as shell commands (--emit_commands) for an external scheduler
(each trial is single-slice; trials need no communication, SURVEY.md §2.9).

    python -m driving_dirty_tpu.cli.submit --model roadmap_bce --link <data> \
        [--single_run] [--nb_hopt_trials 12] [--tt_name exp1]

Reference flags preserved: --model, --tt_name, --tt_description,
--logs_save_path, --single_run, --nb_hopt_trials.
"""
from __future__ import annotations

import argparse
import itertools
import os
import random
import sys

import numpy as np


def _registry():
    from driving_dirty_tpu.models.basic_ae import BasicAE
    from driving_dirty_tpu.models.bb_mlp import Boxes
    from driving_dirty_tpu.models.roadmap import RoadMap, RoadMapBCEv2
    from driving_dirty_tpu.models.spatial_bb import BBSpatialModel, BBSpatialRoadMap

    from driving_dirty_tpu.models.multitask import MultiTask

    names = {
        "basic_ae": BasicAE,
        "roadmap_mse": RoadMap,
        "roadmap_bce": RoadMapBCEv2,
        "spatial_bb": BBSpatialModel,
        "spatial_rm": BBSpatialRoadMap,
        "bb_mlp": Boxes,
        "multitask": MultiTask,
    }
    try:
        from driving_dirty_tpu.models.faster_rcnn import BBFasterRCNN, FasterRCNNRoadMap

        names["faster_rcnn"] = BBFasterRCNN
        names["faster_rcnn_rm"] = FasterRCNNRoadMap
    except ImportError:
        pass
    return names


# Tunable grids per model, mirroring the reference's opt_list(tunable=True)
# dimensions (e.g. autoencoder.py:166-168, roadmap_bce_v2.py:210-211).
GRIDS = {
    "basic_ae": {"latent_dim": [64, 128], "learning_rate": [1e-3, 1e-4, 1e-5]},
    "roadmap_bce": {"unfreeze_epoch_no": [0, 20]},
    "roadmap_mse": {"learning_rate": [1e-3, 1e-4, 1e-5]},
    "spatial_bb": {"learning_rate": [1e-3, 1e-4, 1e-5]},
    "spatial_rm": {"learning_rate": [1e-3, 1e-4, 1e-5]},
    "bb_mlp": {"learning_rate": [1e-3, 1e-4, 1e-5]},
    "faster_rcnn": {"learning_rate": [1e-3, 1e-4, 1e-5]},
    "faster_rcnn_rm": {"learning_rate": [1e-3, 1e-4, 1e-5], "unfreeze_epoch_no": [0, 10]},
    "multitask": {"learning_rate": [1e-3, 1e-4], "box_loss_weight": [0.5, 1.0, 2.0]},
}


def grid_trials(model_name, limit):
    grid = GRIDS.get(model_name, {})
    keys = sorted(grid)
    combos = list(itertools.product(*(grid[k] for k in keys))) or [()]
    return [dict(zip(keys, c)) for c in combos][:limit]


def main(argv=None):
    from driving_dirty_tpu.cli.common import add_trainer_args, trainer_from_args

    registry = _registry()
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", type=str, default="faster_rcnn_rm")
    ns, _ = pre.parse_known_args(argv)
    if ns.model not in registry:
        sys.exit(f"unknown --model {ns.model!r}; available: {sorted(registry)}")
    task_cls = registry[ns.model]

    parser = argparse.ArgumentParser(parents=[pre])
    parser = add_trainer_args(parser)
    parser = task_cls.add_model_specific_args(parser)
    parser.add_argument("-n", "--tt_name", default="experiment")
    parser.add_argument("-d", "--tt_description", default="")
    parser.add_argument("--logs_save_path", default="logs")
    parser.add_argument("--single_run", action="store_true")
    parser.add_argument("--nb_hopt_trials", type=int, default=12)
    parser.add_argument("--emit_commands", action="store_true",
                        help="print one training command per trial instead of running")
    # Reference cluster flags (submit.py:90-93). --on_cluster emitted Slurm
    # jobs via test-tube; here it emits one shell command per trial for an
    # external scheduler (trials are independent, SURVEY.md §2.9). --nodes
    # maps to jax.distributed multi-host; --conda_env is recorded in emitted
    # commands only.
    parser.add_argument("--nodes", type=int, default=1)
    parser.add_argument("--conda_env", type=str, default=None)
    parser.add_argument("--on_cluster", action="store_true")
    args = parser.parse_args(argv)
    if args.on_cluster:
        args.emit_commands = True
    if getattr(args, "num_nodes", 1) == 1 and args.nodes > 1:
        args.num_nodes = args.nodes
    args.default_root_dir = os.path.join(args.logs_save_path, args.tt_name)

    trials = [{}] if args.single_run else grid_trials(args.model, args.nb_hopt_trials)
    results = []
    for i, overrides in enumerate(trials):
        if args.emit_commands:
            ov = " ".join(f"--{k} {v}" for k, v in overrides.items())
            prefix = f"conda run -n {args.conda_env} " if args.conda_env else ""
            print(f"{prefix}python -m driving_dirty_tpu.cli.submit --model {args.model} "
                  f"--single_run --tt_name {args.tt_name}_t{i} {ov}")
            continue
        trial_args = argparse.Namespace(**vars(args))
        for k, v in overrides.items():
            setattr(trial_args, k, v)
        trial_args.default_root_dir = os.path.join(args.default_root_dir, f"trial_{i}")
        random.seed(trial_args.seed)
        np.random.seed(trial_args.seed)
        task = task_cls(trial_args)
        trainer = trainer_from_args(trial_args)
        print(f"=== trial {i}/{len(trials)}: {overrides} ===")
        results.append(trainer.fit(task, resume_from=trial_args.resume_from_checkpoint))
    return results


if __name__ == "__main__":
    main()
