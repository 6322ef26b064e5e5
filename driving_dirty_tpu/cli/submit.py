"""Experiment orchestration: model registry + hyperparameter grid fan-out.

Re-design of /root/reference/src/submit.py (SURVEY.md §2.8): the MODEL_NAMES
registry, two-phase parsing keyed on --model, and test-tube's grid-search
fan-out (`optimize_parallel_cluster_gpu(nb_trials=12)`, submit.py:72-74). On
TPU the fan-out becomes N independent runs — one per trial:

  * default: sequential in-process;
  * --on_cluster / --parallel_trials K: K CONCURRENT subprocesses on this
    host, each pinned to a disjoint device subset (TPU_VISIBLE_DEVICES for
    TPU VMs; per-process virtual device pools on CPU), with per-trial log
    files and a summary table — the TPU-native equivalent of the reference's
    12 Slurm jobs (trials are independent; no inter-trial comm, SURVEY.md
    §2.9);
  * --emit_commands: print one shell command per trial for an external
    scheduler.

    python -m driving_dirty_tpu.cli.submit --model roadmap_bce --link <data> \
        [--single_run] [--nb_hopt_trials 12] [--tt_name exp1] \
        [--on_cluster --parallel_trials 4]

Reference flags preserved: --model, --tt_name, --tt_description,
--logs_save_path, --single_run, --nb_hopt_trials, --on_cluster, --nodes,
--conda_env.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import time

import numpy as np


def _registry():
    from driving_dirty_tpu.models.basic_ae import BasicAE
    from driving_dirty_tpu.models.bb_mlp import Boxes
    from driving_dirty_tpu.models.roadmap import RoadMap, RoadMapBCE, RoadMapBCEv2
    from driving_dirty_tpu.models.spatial_bb import BBSpatialModel, BBSpatialRoadMap

    from driving_dirty_tpu.models.multitask import MultiTask

    names = {
        "basic_ae": BasicAE,
        "roadmap_mse": RoadMap,
        "roadmap_bce": RoadMapBCEv2,
        "roadmap_bce_v1": RoadMapBCE,  # roadmap_bce_loss.py v1 surface
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


def grid_trials(model_name, limit):
    """Trial override dicts for a model's tunable grid. The grid dimensions
    live WITH the models, declared test-tube style via
    `cli.hyperopt.opt_list(..., options=[...], tunable=True)` /
    `tune(parser, dest, options)` inside each `add_model_specific_args`
    (mirroring the reference, e.g. autoencoder.py:166-168,
    roadmap_bce_v2.py:210-211) — this just collects them off a throwaway
    parser."""
    from driving_dirty_tpu.cli.hyperopt import HyperOptArgumentParser

    p = HyperOptArgumentParser(add_help=False)
    _registry()[model_name].add_model_specific_args(p)
    return p.grid(limit)


def _strip_flags(argv, value_flags, bare_flags):
    """Remove orchestration flags from an argv list (keeping trial flags)."""
    out, skip = [], False
    for tok in argv:
        if skip:
            skip = False
            continue
        name = tok.split("=")[0]
        if name in bare_flags:
            continue
        if name in value_flags:
            skip = "=" not in tok
            continue
        out.append(tok)
    return out


def _is_tpu_host() -> bool:
    """True when subprocesses will target real TPU chips (exclusive-access
    hardware that needs explicit pinning), per the same heuristic _trial_env
    uses to pick its branch."""
    return not (
        os.environ.get("JAX_PLATFORMS", "") in ("cpu", "")
        and "TPU_NAME" not in os.environ
    )


def _detect_tpu_chips() -> int:
    """Count local TPU chips WITHOUT importing jax (initializing jax in the
    parent would claim the chips the trial subprocesses need). TPU VMs expose
    one /dev/accel* node per chip (PCI) or /dev/vfio/<n> per chip (vfio)."""
    import glob

    n = len(glob.glob("/dev/accel*"))
    if not n:
        n = len([p for p in glob.glob("/dev/vfio/*") if p.rsplit("/", 1)[-1].isdigit()])
    return n


def _trial_env(trial_index, slot, devices_per_trial):
    """Per-trial subprocess environment: pin a disjoint device subset.

    TPU VMs: TPU_VISIBLE_DEVICES (comma chip indices) — the trial in
    concurrency SLOT s owns chips [s*k, (s+1)*k). Pinning is by slot, not
    trial index: with 12 trials at 4 concurrent, trial 5 reuses the chips of
    whichever slot freed up, never chips [10,11] of a 8-chip host. CPU
    (tests / no accelerator): each subprocess gets its own k-device virtual
    pool via xla_force_host_platform_device_count (process isolation makes
    the subsets disjoint by construction)."""
    env = os.environ.copy()
    env["DD_TRIAL_INDEX"] = str(trial_index)
    if not devices_per_trial:
        return env
    k = devices_per_trial
    if not _is_tpu_host():
        flags = env.get("XLA_FLAGS", "")
        flags = " ".join(
            t for t in flags.split() if "xla_force_host_platform_device_count" not in t
        )
        if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
            # concurrent trials oversubscribe the host; don't let XLA:CPU's
            # 40 s collective-rendezvous termination kill a slow trial
            flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                      " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
                      " --xla_cpu_collective_timeout_seconds=3600")
        env["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={k}").strip()
        env.setdefault("JAX_PLATFORMS", "cpu")
    else:
        env["TPU_VISIBLE_DEVICES"] = ",".join(str(slot * k + j) for j in range(k))
    return env


def _last_val_loss(trial_root):
    """Best (min) val_loss across any task metrics.jsonl under trial_root."""
    best = None
    for dirpath, _, files in os.walk(trial_root):
        if "metrics.jsonl" not in files:
            continue
        with open(os.path.join(dirpath, "metrics.jsonl")) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                v = rec.get("val_loss")
                if v is not None and (best is None or v < best):
                    best = v
    return best


def _notify_done(args, name, rc, val_loss):
    """Completion hook (--on_done_cmd): the reference notified by Slurm email
    (test-tube notify_on_end, /root/reference/src/submit.py:55); on a TPU VM
    the analog is a user shell hook (curl a webhook, touch a sentinel, ...)."""
    cmd = getattr(args, "on_done_cmd", None)
    if not cmd:
        return
    env = os.environ.copy()
    env["DD_TRIAL_NAME"] = str(name)
    env["DD_TRIAL_RC"] = str(rc)
    env["DD_TRIAL_VAL_LOSS"] = "" if val_loss is None else repr(float(val_loss))
    try:
        subprocess.run(cmd, shell=True, env=env, timeout=120)
    except Exception as e:  # noqa: BLE001 — notification must never kill runs
        print(f"[submit] on_done_cmd failed: {e}")


def run_trials_concurrent(args, trials, base_argv):
    """Run the grid as concurrent pinned subprocesses with per-trial logs.

    The TPU-native `optimize_parallel_cluster_gpu(nb_trials=12)`
    (/root/reference/src/submit.py:72-74): instead of 12 Slurm jobs, up to
    --parallel_trials subprocesses run at once on this host, each on its own
    device subset, logging to <root>/trial_i/trial.log. Returns a summary
    list of dicts (also printed as a table).
    """
    import queue
    from concurrent.futures import ThreadPoolExecutor

    n_par = max(1, args.parallel_trials)
    total_dev = args.gpus if args.gpus else None
    if _is_tpu_host():
        # TPU chips are exclusive-access: every concurrent trial MUST be
        # pinned to a disjoint subset or all but the first fail to
        # initialize. Detect the chip count when --gpus is unset, and never
        # run more concurrent trials than there are chips.
        if total_dev is None:
            total_dev = _detect_tpu_chips() or 1
        if n_par > total_dev:
            print(f"[submit] clamping --parallel_trials {n_par} -> {total_dev} "
                  f"(one chip minimum per trial; {total_dev} chip(s) on this host)")
            n_par = total_dev
        dev_per_trial = total_dev // n_par
    else:
        # CPU virtual pools: per-process isolation makes subsets disjoint,
        # so every trial can have the full requested device count
        dev_per_trial = (total_dev // n_par) if total_dev and total_dev >= n_par else total_dev
    clean = _strip_flags(
        list(base_argv),
        value_flags={"--parallel_trials", "--nb_hopt_trials", "--tt_name",
                     "--gpus", "--logs_save_path", "--on_done_cmd"},
        bare_flags={"--on_cluster", "--single_run", "--emit_commands"},
    )
    # chips are pinned per concurrency SLOT (returned to this pool when a
    # trial ends), so trial index may exceed n_par without pinning off-host
    free_slots: "queue.Queue[int]" = queue.Queue()
    for s in range(n_par):
        free_slots.put(s)

    def run_one(i_ov):
        i, overrides = i_ov
        slot = free_slots.get()
        try:
            # child recomputes its root as logs_save_path/tt_name, so point
            # those at <exp_root>/trial_i
            trial_root = os.path.join(args.default_root_dir, f"trial_{i}")
            os.makedirs(trial_root, exist_ok=True)
            cmd = [sys.executable, "-m", "driving_dirty_tpu.cli.submit", *clean,
                   "--single_run", "--logs_save_path", args.default_root_dir,
                   "--tt_name", f"trial_{i}"]
            if dev_per_trial:
                cmd += ["--gpus", str(dev_per_trial)]
            for k, v in overrides.items():
                cmd += [f"--{k}", str(v)]
            log_path = os.path.join(trial_root, "trial.log")
            t0 = time.perf_counter()
            with open(log_path, "w") as log:
                proc = subprocess.run(
                    cmd, stdout=log, stderr=subprocess.STDOUT,
                    env=_trial_env(i, slot, dev_per_trial), cwd=os.getcwd(),
                )
            result = {
                "trial": i,
                "overrides": overrides,
                "rc": proc.returncode,
                "seconds": round(time.perf_counter() - t0, 1),
                "val_loss": _last_val_loss(trial_root),
                "log": log_path,
            }
        finally:
            free_slots.put(slot)
        # --on_done_cmd is stripped from the child argv above, so the parent
        # is the single notifier — one call per trial, correct trial name
        _notify_done(args, f"trial_{i}", result["rc"], result["val_loss"])
        return result

    with ThreadPoolExecutor(n_par) as pool:
        results = list(pool.map(run_one, enumerate(trials)))

    print(f"\n=== {args.tt_name}: {len(results)} trials, {n_par} concurrent"
          + (f", {dev_per_trial} device(s)/trial" if dev_per_trial else "") + " ===")
    print(f"{'trial':>5}  {'rc':>3}  {'sec':>7}  {'val_loss':>10}  overrides")
    for r in sorted(results, key=lambda r: (r["val_loss"] is None, r["val_loss"])):
        vl = f"{r['val_loss']:.5f}" if r["val_loss"] is not None else "-"
        print(f"{r['trial']:>5}  {r['rc']:>3}  {r['seconds']:>7.1f}  {vl:>10}  {r['overrides']}")
    return results


def _slurm_time_to_minutes(t: str) -> float:
    """Slurm --time strings to minutes: 'D-HH:MM:SS', 'HH:MM:SS', 'MM:SS'
    (Slurm reads bare 'MM' as minutes and 'MM:SS' as min:sec)."""
    days = 0
    if "-" in t:
        d, t = t.split("-", 1)
        days = int(d)
    parts = [int(p) for p in t.split(":")]
    if len(parts) == 3:
        h, m, s = parts
    elif len(parts) == 2:
        h, (m, s) = 0, parts
    else:
        h, m, s = 0, parts[0], 0
    return days * 1440 + h * 60 + m + s / 60.0


def emit_slurm(args, trials, base_argv):
    """Write one sbatch script per trial + a submit_all.sh driver.

    The TPU-native replacement for test-tube's
    `SlurmCluster.optimize_parallel_cluster_gpu(nb_trials=12)`
    (/root/reference/src/submit.py:49-74): each script carries the job
    resources (walltime/cpus/mem, reference defaults 24h/10/30GB at
    submit.py:58-66), optional email notify (notify_on_end, submit.py:55),
    conda env activation (submit.py:57), and the checkpoint-before-walltime
    resubmit contract (minutes_to_checkpoint_before_walltime=5,
    submit.py:65): the trial runs with --walltime_minutes set to the Slurm
    budget so the trainer checkpoints 5 min early and exits; exit code 3
    (walltime stop) makes the script sbatch itself again, resuming from
    last.ckpt. `#SBATCH --signal=B:TERM@300` is a second safety net — the
    trainer's SIGTERM handler checkpoints even if the in-process budget
    clock drifted.
    """
    import shlex

    out_dir = os.path.abspath(args.emit_slurm)
    os.makedirs(out_dir, exist_ok=True)
    exp_root = os.path.abspath(args.default_root_dir)
    wall_min = _slurm_time_to_minutes(args.slurm_time)
    clean = _strip_flags(
        list(base_argv),
        value_flags={"--parallel_trials", "--nb_hopt_trials", "--tt_name",
                     "--logs_save_path", "--on_done_cmd", "--emit_slurm",
                     "--slurm_time", "--slurm_cpus", "--slurm_mem",
                     "--slurm_partition", "--slurm_gres", "--notify_email",
                     "--conda_env", "--walltime_minutes",
                     "--resume_from_checkpoint"},
        bare_flags={"--on_cluster", "--single_run", "--emit_commands"},
    )
    task_name = _registry()[args.model].name  # trainer writes <root>/<task.name>/
    scripts = []
    for i, overrides in enumerate(trials):
        trial_root = os.path.join(exp_root, f"trial_{i}")
        job = f"{args.tt_name}_t{i}"
        lines = [
            "#!/bin/bash",
            f"#SBATCH --job-name={job}",
            f"#SBATCH --output={trial_root}/slurm-%j.out",
            f"#SBATCH --time={args.slurm_time}",
            "#SBATCH --nodes=1",
            f"#SBATCH --cpus-per-task={args.slurm_cpus}",
            f"#SBATCH --mem={args.slurm_mem}",
            "#SBATCH --signal=B:TERM@300",
        ]
        if args.slurm_partition:
            lines.append(f"#SBATCH --partition={args.slurm_partition}")
        if args.slurm_gres:
            lines.append(f"#SBATCH --gres={args.slurm_gres}")
        if args.notify_email:
            lines += [f"#SBATCH --mail-user={args.notify_email}",
                      "#SBATCH --mail-type=END,FAIL"]
        lines.append("")
        if args.conda_env:
            lines.append(f"source activate {shlex.quote(args.conda_env)}")
        cmd = ["python", "-m", "driving_dirty_tpu.cli.submit", *clean,
               "--single_run", "--logs_save_path", exp_root,
               "--tt_name", f"trial_{i}",
               "--walltime_minutes", str(wall_min)]
        for k, v in overrides.items():
            cmd += [f"--{k}", str(v)]
        lines += [
            f"cd {shlex.quote(os.getcwd())}",
            f"mkdir -p {shlex.quote(trial_root)}",
            f"CKPT={shlex.quote(os.path.join(trial_root, task_name, 'last.ckpt'))}",
            'RESUME=""',
            '[ -f "$CKPT" ] && RESUME="--resume_from_checkpoint $CKPT"',
            " ".join(shlex.quote(t) for t in cmd) + " $RESUME",
            "rc=$?",
            "if [ $rc -eq 3 ]; then",
            '  echo "walltime checkpoint reached; resubmitting"',
            '  sbatch "$0"',
            "fi",
            "exit $rc",
            "",
        ]
        path = os.path.join(out_dir, f"trial_{i}.sh")
        with open(path, "w") as f:
            f.write("\n".join(lines))
        os.chmod(path, 0o755)
        scripts.append(path)
    driver = os.path.join(out_dir, "submit_all.sh")
    with open(driver, "w") as f:
        f.write("#!/bin/bash\n# submit the full grid (one Slurm job per trial)\n"
                + "".join(f"sbatch {shlex.quote(s)}\n" for s in scripts))
    os.chmod(driver, 0o755)
    print(f"wrote {len(scripts)} sbatch scripts + {driver}")
    return scripts


def main(argv=None):
    from driving_dirty_tpu.cli.common import (add_trainer_args, honor_platform_env,
                                              trainer_from_args)

    honor_platform_env()
    registry = _registry()
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", type=str, default="faster_rcnn_rm")
    ns, _ = pre.parse_known_args(argv)
    if ns.model not in registry:
        sys.exit(f"unknown --model {ns.model!r}; available: {sorted(registry)}")
    task_cls = registry[ns.model]

    # HyperOptArgumentParser so the models' opt_list/tune declarations are
    # collected as grid dimensions (test-tube surface, SURVEY.md §5.6)
    from driving_dirty_tpu.cli.hyperopt import HyperOptArgumentParser

    strat = argparse.ArgumentParser(add_help=False)
    strat.add_argument("--hopt_strategy", default="grid_search",
                       choices=("grid_search", "random_search"),
                       help="trial enumeration over the models' tunable "
                            "dimensions (test-tube HyperOptArgumentParser "
                            "strategy; reference uses grid_search)")
    sns, _ = strat.parse_known_args(argv)
    parser = HyperOptArgumentParser(parents=[pre, strat],
                                    strategy=sns.hopt_strategy)
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
    parser.add_argument("--on_cluster", action="store_true",
                        help="run the grid as concurrent pinned subprocesses "
                             "on this host (see run_trials_concurrent)")
    parser.add_argument("--parallel_trials", type=int, default=0,
                        help="max concurrent trial subprocesses; implies the "
                             "--on_cluster runner when > 0 (default with "
                             "--on_cluster: 4)")
    # Slurm emission (test-tube SlurmCluster analog, reference submit.py:49-74)
    parser.add_argument("--emit_slurm", type=str, default=None, metavar="DIR",
                        help="write one sbatch script per trial (+ submit_all.sh) "
                             "to DIR instead of running; scripts carry walltime-"
                             "checkpoint resubmit and optional email notify")
    parser.add_argument("--slurm_time", type=str, default="24:00:00",
                        help="Slurm --time per trial (reference: 24h)")
    parser.add_argument("--slurm_cpus", type=int, default=10,
                        help="cpus-per-task (reference: 10)")
    parser.add_argument("--slurm_mem", type=str, default="30GB",
                        help="job memory (reference: 30GB)")
    parser.add_argument("--slurm_partition", type=str, default=None)
    parser.add_argument("--slurm_gres", type=str, default=None,
                        help="e.g. tpu:1 / gpu:k80:1 — site-specific, omitted "
                             "when unset")
    parser.add_argument("--notify_email", type=str, default=None,
                        help="Slurm mail-user for END,FAIL notifications "
                             "(test-tube notify_on_end, reference submit.py:55)")
    parser.add_argument("--on_done_cmd", type=str, default=None,
                        help="shell command run after each trial with "
                             "DD_TRIAL_NAME/DD_TRIAL_RC/DD_TRIAL_VAL_LOSS in "
                             "the environment — the TPU-VM replacement for "
                             "test-tube's notify_on_end email "
                             "(reference submit.py:55)")
    args = parser.parse_args(argv)
    if args.on_cluster and not args.parallel_trials:
        args.parallel_trials = 4
    if getattr(args, "num_nodes", 1) == 1 and args.nodes > 1:
        args.num_nodes = args.nodes
    args.default_root_dir = os.path.join(args.logs_save_path, args.tt_name)

    trials = [{}] if args.single_run else parser.grid(args.nb_hopt_trials)
    if args.emit_slurm:
        base_argv = list(argv) if argv is not None else sys.argv[1:]
        return emit_slurm(args, trials, base_argv)
    if args.parallel_trials and not args.single_run and not args.emit_commands:
        base_argv = list(argv) if argv is not None else sys.argv[1:]
        return run_trials_concurrent(args, trials, base_argv)
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
        if not args.single_run:
            # grid mode: one subdir per trial. --single_run uses the root
            # directly — fan-out parents and emitted sbatch scripts already
            # pass --tt_name trial_i, and appending another trial_0 here
            # would double the path (breaking the scripts' resume CKPT path)
            trial_args.default_root_dir = os.path.join(args.default_root_dir, f"trial_{i}")
        random.seed(trial_args.seed)
        np.random.seed(trial_args.seed)
        task = task_cls(trial_args)
        trainer = trainer_from_args(trial_args)
        print(f"=== trial {i}/{len(trials)}: {overrides} ===")
        fit = trainer.fit(task, resume_from=trial_args.resume_from_checkpoint)
        results.append(fit)
        import numpy as _np

        _notify_done(args, f"trial_{i}", 0,
                     fit.best_val_loss if _np.isfinite(fit.best_val_loss) else None)
    return results


if __name__ == "__main__":
    _results = main()
    # exit 3 = stopped on the walltime-checkpoint contract; resubmit wrappers
    # (emit_slurm scripts) requeue on this code and resume from last.ckpt
    if isinstance(_results, list) and any(
        "walltime" in (getattr(r, "stop_reason", None) or "") for r in _results
    ):
        sys.exit(3)
