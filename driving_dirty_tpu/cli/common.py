"""Shared CLI machinery: Lightning-compatible trainer flags + runner.

Preserves the reference's argparse surface so existing scripts run unchanged
on a TPU VM (BASELINE.json): every per-model script accepts the Trainer flags
that Lightning 0.7.5's `Trainer.add_argparse_args` injected (--gpus,
--max_epochs, --num_nodes, --precision, --resume_from_checkpoint, ...,
SURVEY.md §5.6) plus the model-specific flags from `add_model_specific_args`.

`--gpus N` is reinterpreted as "use N TPU devices" (a data-parallel mesh);
`--num_nodes > 1` triggers jax.distributed initialization (DCN).
"""
from __future__ import annotations

import argparse
import os
import random

import numpy as np
import jax


def cache_fingerprint() -> str:
    """Fingerprint for the persistent-cache directory name.

    XLA's own cache key does NOT cover XLA:CPU's AOT target-feature set:
    tuning features like +prefer-no-gather are chosen from the CPU *model*,
    not the raw cpuid flags, so a flags-only key (rounds 2-4) let entries
    baked on another machine load with cpu_aot_loader SIGILL warnings
    (MULTICHIP_r04). Key by jaxlib version + CPU model name + flags: any of
    those changing yields a fresh directory and a clean cold compile.

    Note (round 5, observed): even SAME-host reloads can print
    cpu_aot_loader "feature not supported" warnings for XLA's own tuning
    pseudo-features (+prefer-no-gather/+prefer-no-scatter) — LLVM host
    detection never reports those strings, so the loader flags entries this
    very host wrote. When the rest of the compile-feature list matches the
    host list, the warning is benign loader noise, not cross-machine reuse;
    the fingerprint above is what actually guards against the latter.
    """
    import hashlib

    try:
        import jaxlib

        bits = [getattr(jaxlib, "__version__", "unknown")]
    except ImportError:
        bits = ["no-jaxlib"]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                if len(bits) >= 3:
                    break
    except OSError:
        pass
    return hashlib.sha1("\n".join(bits).encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None):
    """Persist XLA compilations across processes (first compiles of the big
    detection programs take minutes on a tunneled TPU; cached reloads are
    seconds). Called by every CLI entry point."""
    if path is None:
        path = os.environ.get("DD_COMPILATION_CACHE")
    if path is None:
        path = f"/tmp/dd_jax_cache_{cache_fingerprint()}"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from driving_dirty_tpu.parallel import mesh as mesh_lib
from driving_dirty_tpu.train.trainer import Trainer

REFERENCE_SEED = 20200505  # every reference entry point seeds with this


def add_trainer_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    g = parser.add_argument_group("trainer")
    g.add_argument("--max_epochs", type=int, default=1000)
    g.add_argument("--max_steps", type=int, default=None,
                   help="stop (with a resumable checkpoint) after N optimizer steps")
    g.add_argument("--gpus", type=int, default=None,
                   help="number of accelerator devices (TPU chips) to use")
    g.add_argument("--num_nodes", type=int, default=1)
    g.add_argument("--model_parallel", type=int, default=1,
                   help="size of the 'model' mesh axis (shards the big heads)")
    g.add_argument("--precision", type=int, default=32, choices=[8, 16, 32],
                   help="16 -> bfloat16 compute where supported")
    g.add_argument("--resume_from_checkpoint", type=str, default=None)
    g.add_argument("--default_root_dir", type=str, default="logs")
    g.add_argument("--version", type=int, default=None,
                   help="pin the experiment version (writes into "
                        "<root>/<task>/version_N); default: allocate the next "
                        "free version per run, test-tube style. Resuming from "
                        "a checkpoint keeps the checkpoint's version.")
    g.add_argument("--limit_train_batches", type=int, default=None)
    g.add_argument("--limit_val_batches", type=int, default=None)
    g.add_argument("--log_every_n_steps", type=int, default=50)
    g.add_argument("--seed", type=int, default=REFERENCE_SEED)
    g.add_argument("--profile_dir", type=str, default=None)
    g.add_argument("--checkpoint_every_n_steps", type=int, default=None)
    g.add_argument("--walltime_minutes", type=float, default=None,
                   help="stop with a resumable checkpoint ~5 min before this "
                        "budget (test-tube's minutes_to_checkpoint_before_walltime)")
    g.add_argument("--debug", action="store_true", help="enable jax debug_nans")
    g.add_argument("--gradient_clip_val", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off; Lightning "
                        "0.7.5 Trainer surface)")
    g.add_argument("--accumulate_grad_batches", type=int, default=1,
                   help="optimizer step every N batches (optax.MultiSteps; "
                        "effective batch = N * batch_size)")
    g.add_argument("--distributed_backend", type=str, default=None,
                   help="accepted for reference-script compatibility and "
                        "ignored: XLA emits the collectives a mesh needs — "
                        "there is no NCCL/DDP backend to choose")
    g.add_argument("--num_workers", type=int, default=None,
                   help="decode pool threads (default: min(48, 4*cpus); the "
                        "reference hardcoded 4)")
    g.add_argument("--uint8_pipeline", type=int, default=1, choices=[0, 1],
                   help="ship camera images to the device as raw uint8 and "
                        "normalize on-TPU (4x less host CPU + host->HBM "
                        "traffic); 0 = legacy host-side float32 /255")
    g.add_argument("--remat", type=int, default=None, choices=[0, 1],
                   help="rematerialize the encoder in training (default: "
                        "per-task — on for the panorama models, which OOM HBM "
                        "at batch 128 without it; off for faster_rcnn, whose "
                        "800x800 activations fit and gain ~12%% stored)")
    return parser


def trainer_from_args(args) -> Trainer:
    enable_compilation_cache()
    mesh_lib.initialize_distributed(getattr(args, "num_nodes", 1))
    mesh = None
    gpus = getattr(args, "gpus", None)
    mp = getattr(args, "model_parallel", 1)
    if (gpus is not None and gpus > 1) or mp > 1:
        mesh = mesh_lib.build_mesh(gpus, mp)
    return Trainer(
        max_epochs=args.max_epochs,
        default_root_dir=args.default_root_dir,
        mesh=mesh,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
        log_every_n_steps=args.log_every_n_steps,
        seed=args.seed,
        profile_dir=args.profile_dir,
        debug_nans=getattr(args, "debug", False),
        checkpoint_every_n_steps=getattr(args, "checkpoint_every_n_steps", None),
        max_steps=getattr(args, "max_steps", None),
        walltime_minutes=getattr(args, "walltime_minutes", None),
        gradient_clip_val=getattr(args, "gradient_clip_val", 0.0),
        accumulate_grad_batches=getattr(args, "accumulate_grad_batches", 1),
        version=getattr(args, "version", None),
    )


def honor_platform_env():
    """Re-assert an explicit JAX_PLATFORMS=cpu in-process.

    The ambient tunneled-TPU site plugin re-exports JAX_PLATFORMS at import
    time, silently overriding a caller's explicit cpu request (e.g. submit
    fan-out trial children pinned to disjoint virtual CPU pools, or hermetic
    test subprocesses). Runs before first device use, so the config update
    still takes effect."""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def run_task(task_cls, argv=None, description=None):
    """Per-model __main__: parser = trainer args + model args -> fit."""
    honor_platform_env()
    parser = argparse.ArgumentParser(description=description or task_cls.__name__)
    parser = add_trainer_args(parser)
    parser = task_cls.add_model_specific_args(parser)
    args = parser.parse_args(argv)
    random.seed(args.seed)
    np.random.seed(args.seed)
    task = task_cls(args)
    trainer = trainer_from_args(args)
    return trainer.fit(task, resume_from=args.resume_from_checkpoint)
