"""The training runtime: compiled fit/val loops over a device mesh.

Replaces pytorch_lightning.Trainer (the reference's L5,
invoked at every task's __main__, e.g.
/root/reference/src/autoencoder/autoencoder.py:185-193) with a TPU-first loop:

  * one jitted `train_step(params, opt_state, state, batch, rng)` with
    donated carries — params/optimizer state never leave HBM;
  * freeze/unfreeze staging as a STATIC partition: frozen leaves enter the
    loss under stop_gradient so XLA prunes their whole backward cone (the
    frozen-encoder roadmap fine-tune measures 2544 vs 690 scenes/s — 3.7× —
    against computing-then-discarding the gradients, scripts/probe_frozen.py);
    the unfreeze epoch compiles a second program once (persistent-cached);
  * host work (logging, checkpoints, LR plateau logic) reads only the metrics
    it needs; the step loop is async-dispatch and never blocks on device
    except at epoch boundaries and the log cadence;
  * optional ('data','model') mesh: batches are split on 'data', params laid
    out by the task's sharding rules; XLA emits the gradient psum over ICI
    (SURVEY.md §2.9 — this replaces Lightning's DDP/NCCL path);
  * scenes/sec/chip is tracked first-class (BASELINE.json north-star metric);
  * checkpoints: keep-last every epoch + keep-best on monitored val_loss,
    like Lightning's ModelCheckpoint default (SURVEY.md §5.4).
"""
from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax

from driving_dirty_tpu.checkpoints import io as ckpt_io
from driving_dirty_tpu.data.pipeline import device_prefetch
from driving_dirty_tpu.parallel import mesh as mesh_lib
from driving_dirty_tpu.train.logging import MetricsLogger


def _opt_hyperparams(opt_state):
    """The inject_hyperparams dict (live LR), reaching through an
    optax.MultiSteps wrapper when gradient accumulation is on."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    inner = getattr(opt_state, "inner_opt_state", None)
    if inner is not None and hasattr(inner, "hyperparams"):
        return inner.hyperparams
    return None


def _on_axon_platform() -> bool:
    """True on the experimental tunneled 'axon' TPU platform. The plugin
    registers its backend as plain 'tpu' (jax.default_backend(),
    device.platform, and the client platform ALL report 'tpu'), so the only
    reliable discriminator is the JAX_PLATFORMS env the plugin sets."""
    return "axon" in os.environ.get("JAX_PLATFORMS", "")


# Mask-array helpers: the trainer itself now freezes via a static
# stop_gradient partition (see _make_train_step); these remain for
# scripts/probe_fr_crash.py, which reproduces the axon worker crash against
# the original mask-array step.
def _tree_ones_mask(params):
    return jax.tree.map(lambda p: jnp.ones((), p.dtype if jnp.issubdtype(p.dtype, jnp.floating) else jnp.float32), params)


def _bool_mask_to_arrays(params, bool_mask):
    return jax.tree.map(
        lambda p, m: jnp.asarray(1.0 if m else 0.0, jnp.float32), params, bool_mask
    )


def _prune_to_template(loaded, template, where: str):
    """Intersect a loaded checkpoint subtree with the model's current tree.

    Keys the template lacks are dropped (returned in `pruned` for the resume
    log); keys the template has but the checkpoint lacks raise — silently
    training fresh leaves inside a "resumed" run would corrupt the result.
    Handles the c3-only param-tree slimming (models/pretrained.init_backbone):
    older checkpoints carry the encoder's dense path that current detection/
    spatial tasks no longer instantiate (ADVICE r3)."""
    pruned: set = set()

    def rec(ld, tp, path):
        if isinstance(tp, dict) and isinstance(ld, dict):
            missing = set(tp) - set(ld)
            if missing:
                raise ValueError(
                    f"checkpoint {where} is missing {sorted(missing)} under "
                    f"'{path or '<root>'}' — not resumable into this model")
            pruned.update(f"{path}/{k}" if path else str(k)
                          for k in set(ld) - set(tp))
            return {k: rec(ld[k], tp[k], f"{path}/{k}" if path else str(k))
                    for k in tp}
        return ld

    return rec(loaded, template, ""), pruned


@dataclass
class FitResult:
    params: object
    state: object
    best_val_loss: float
    best_ckpt_path: str | None
    last_ckpt_path: str | None
    scenes_per_sec: float
    # why fit ended early (None = ran to max_epochs): "walltime budget
    # reached", "max_steps=N reached", or "preemption signal". The submit CLI
    # maps walltime stops to process exit code 3 so resubmit wrappers
    # (cli/submit.py --emit_slurm) know to requeue the job.
    stop_reason: str | None = None


class Trainer:
    def __init__(
        self,
        max_epochs: int = 1,
        default_root_dir: str = "logs",
        mesh=None,
        num_devices: int | None = None,
        model_parallel: int = 1,
        limit_train_batches: int | None = None,
        limit_val_batches: int | None = None,
        log_every_n_steps: int = 50,
        seed: int = 20200505,
        enable_checkpointing: bool = True,
        enable_progress_bar: bool = True,
        profile_dir: str | None = None,
        debug_nans: bool = False,
        donate_buffers: bool | None = None,
        checkpoint_every_n_steps: int | None = None,
        max_steps: int | None = None,
        walltime_minutes: float | None = None,
        checkpoint_before_walltime_minutes: float = 5.0,
        gradient_clip_val: float = 0.0,
        accumulate_grad_batches: int = 1,
        version: int | None = None,
    ):
        # experiment version (test-tube semantics, submit.py:36-37 via the TT
        # logger): None = allocate the next free version_N under
        # <root>/<task>/; an int pins it (reuse/overwrite that version)
        self.version = version
        self.gradient_clip_val = gradient_clip_val
        self.accumulate_grad_batches = max(1, int(accumulate_grad_batches))
        self.max_epochs = max_epochs
        self.root = default_root_dir
        if mesh is None and (num_devices is not None or model_parallel > 1):
            mesh = mesh_lib.build_mesh(num_devices, model_parallel)
        self.mesh = mesh
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.log_every = log_every_n_steps
        self.seed = seed
        self.enable_checkpointing = enable_checkpointing
        self.enable_progress_bar = enable_progress_bar
        self.profile_dir = profile_dir
        # jax.profiler on the tunneled axon platform: re-verified WORKING
        # 2026-08-20 (scripts/probe_profiler.py, 4/5 watchdog runs produced
        # real xplane + trace.json artifacts; the one observed hang coincided
        # with a wedged tunnel, which hangs ALL device compute — tracing adds
        # no extra hang risk). The r1-era hard disable is gone; if the tunnel
        # wedges mid-trace the whole step loop is stuck anyway.
        if debug_nans:
            jax.config.update("jax_debug_nans", True)
        if donate_buffers is None:
            # The experimental tunneled 'axon' platform crashes its worker on
            # donated-buffer reuse in large programs (verified empirically on
            # the detection train step: the fused+donated program kills the
            # worker at its first execution; the split non-donated programs
            # run clean). Donation halves peak param memory, so keep it on
            # for real tpu/cpu backends. NOTE: the check must be the env var
            # — jax.default_backend() reports plain 'tpu' on axon, which made
            # an earlier version of this guard never fire (the r2
            # cli.faster_rcnn worker-crash investigation).
            donate_buffers = not _on_axon_platform()
        self.donate_buffers = donate_buffers
        self.checkpoint_every_n_steps = checkpoint_every_n_steps
        self.max_steps = max_steps
        # test-tube's minutes_to_checkpoint_before_walltime=5
        # (/root/reference/src/submit.py:64-65): stop with a resumable
        # checkpoint `checkpoint_before_walltime_minutes` before the
        # `walltime_minutes` budget expires, so a resubmitted job continues
        # exactly where this one left off.
        self.walltime_minutes = walltime_minutes
        self.checkpoint_before_walltime_minutes = checkpoint_before_walltime_minutes
        self._walltime_t0 = time.perf_counter()
        self._preempted = False
        self._cost_logged = False
        self._ckpt_writer = None
        self.global_step = 0

    def _walltime_exceeded(self) -> bool:
        if self.walltime_minutes is None:
            return False
        budget = (self.walltime_minutes - self.checkpoint_before_walltime_minutes) * 60.0
        return time.perf_counter() - self._walltime_t0 >= max(budget, 0.0)

    def _install_preemption_handler(self):
        """SIGTERM -> checkpoint at the next step boundary, then exit the fit
        loop cleanly. TPU-native analog of the reference's Slurm
        minutes_to_checkpoint_before_walltime=5 (submit.py:65, SURVEY.md §5.3):
        preemptible TPU VMs deliver SIGTERM before reclaim."""
        import signal

        def handler(signum, frame):
            self._preempted = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            pass  # not in the main thread; periodic checkpoints still apply

    # ------------------------------------------------------------------
    def _build_optimizer(self, task):
        """Adam with a live (injected) LR; optional global-norm clipping and
        optax.MultiSteps gradient accumulation (Lightning's
        --gradient_clip_val / --accumulate_grad_batches surface). Clipping
        lives INSIDE inject_hyperparams so `opt_state.hyperparams` stays the
        top-level handle the plateau scheduler and resume path poke."""
        clip = self.gradient_clip_val
        if clip and clip > 0:
            def adam_clipped(learning_rate):
                return optax.chain(optax.clip_by_global_norm(clip),
                                   optax.adam(learning_rate))

            base = optax.inject_hyperparams(adam_clipped)(
                learning_rate=task.learning_rate())
        else:
            base = optax.inject_hyperparams(optax.adam)(learning_rate=task.learning_rate())
        if self.accumulate_grad_batches > 1:
            # params change every k micro-batches; global_step keeps counting
            # micro-batches (effective batch = k * batch_size)
            base = optax.MultiSteps(base, every_k_schedule=self.accumulate_grad_batches)
        return base

    def _make_train_step(self, task, tx, static_mask=None):
        """One compiled train step, specialized per freeze mask.

        `static_mask` is a pytree of *Python* bools (True = trainable) or
        None. Frozen leaves enter the loss under `stop_gradient`, so XLA
        prunes their entire backward cone — the frozen-encoder fine-tune
        phase measures 3.7× faster than the mask-array alternative that
        computes the full gradient and multiplies it by zero
        (scripts/probe_frozen.py: 2544 vs 690 scenes/s at batch 128).
        Changing the mask (the unfreeze epoch) compiles a second program
        once, hitting the persistent compilation cache on reruns. Frozen
        leaves still flow through the optimizer with exact-zero gradients,
        so Adam moments stay zero, params stay untouched, and resume
        semantics are unchanged."""
        def grad_fn(params, state, batch, rng):
            def loss_fn(p):
                if static_mask is not None:
                    p = jax.tree.map(
                        lambda leaf, m: leaf if m else jax.lax.stop_gradient(leaf),
                        p, static_mask)
                loss, (new_state, metrics) = task.loss(p, state, batch, rng, train=True)
                return loss, (new_state, metrics)

            (loss, (new_state, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return grads, new_state, metrics

        def update_fn(params, opt_state, grads):
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        def fused(params, opt_state, state, batch, rng):
            grads, new_state, metrics = grad_fn(params, state, batch, rng)
            params, opt_state = update_fn(params, opt_state, grads)
            return params, opt_state, new_state, metrics

        # Batches arrive sharded on 'data' under a mesh; params/opt_state keep
        # their placement (task sharding rules or replicated). XLA derives the
        # gradient psum from the shardings — no explicit collectives.
        if self.donate_buffers:
            return jax.jit(fused, donate_argnums=(0, 1, 2))
        del fused  # split mode below
        # Split-program mode (axon): the fused grad+update program miscompiles
        # on the tunneled TPU for some inputs (worker crash, observed on the
        # detection step); two separately-compiled programs run clean and
        # compile faster. Costs one extra HBM round trip of the grads.
        jg = jax.jit(grad_fn)
        ju = jax.jit(update_fn, donate_argnums=(2,))

        def split(params, opt_state, state, batch, rng):
            grads, new_state, metrics = jg(params, state, batch, rng)
            params, opt_state = ju(params, opt_state, grads)
            return params, opt_state, new_state, metrics

        split._grad_jit = jg  # exposed for the cost-analysis fallback
        return split

    def _log_cost_analysis(self, train_step, logger, args):
        """Compiled-HLO cost analysis into the metrics JSONL (SURVEY.md §5.1
        complement to jax.profiler traces — always available, even where a
        profiler is not): flops + HBM bytes of the train step, logged once.
        The lowering hits the persistent compilation cache (same HLO as the
        step that just ran), so this costs a trace, not a compile."""
        try:
            target = getattr(train_step, "_grad_jit", None)
            if target is not None:
                params, opt_state, state, batch, rng = args
                lowered = target.lower(params, state, batch, rng)
            elif hasattr(train_step, "lower"):
                lowered = train_step.lower(*args)
            else:
                return
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, list):  # older jax returns per-device list
                ca = ca[0] if ca else {}
            out = {}
            for k in ("flops", "bytes accessed"):
                if k in ca:
                    out["cost_" + k.replace(" ", "_")] = float(ca[k])
            if out:
                logger.log_scalars(out, self.global_step)
        except Exception as e:  # noqa: BLE001 — diagnostics only, never fatal
            print(f"[trainer] cost analysis unavailable: {e}")

    def _make_val_step(self, task):
        def val_step(params, state, batch, rng):
            return task.val_metrics(params, state, batch, rng)

        return jax.jit(val_step)

    # ------------------------------------------------------------------
    def _save_ckpt(self, path, task, params, state, opt_state, rng, meta,
                   best_val, plateau_wait, lr, sync: bool = False):
        """One checkpoint format for last/best/mid-epoch saves.

        Carries the FULL training state — params, BN state, optimizer state
        (Adam moments + injected LR), LR-plateau counters, best-val tracker,
        rng key, and the (epoch, batch) data-order cursor — so a preempted run
        resumes exactly. This is the Lightning `optimizer_states`/
        `lr_schedulers` contract the reference's walltime-resubmit flow
        depends on (/root/reference/src/submit.py:65, SURVEY.md §5.4).

        Saves go through a background AsyncWriter so periodic checkpointing
        never stalls the step loop (jax arrays are immutable — capturing the
        pytree by reference is a consistent snapshot; under buffer donation
        the device_get happens eagerly because the next step invalidates the
        buffers). `sync=True` (preemption / fit-exit) blocks until the file
        is on disk — a resubmitted job must find a complete checkpoint."""
        meta = dict(meta)
        meta["trainer_state"] = {
            "best_val": float(best_val),
            "plateau_wait": int(plateau_wait),
            "lr": float(lr),
            "seed": int(self.seed),
        }
        if self._ckpt_writer is None:
            self._ckpt_writer = ckpt_io.AsyncWriter()
        # eager_get on axon even without donation: a multi-GB device_get
        # running in the writer thread CONCURRENTLY with the next epoch's
        # dispatched steps exhausts the tunneled platform's backend
        # (RESOURCE_EXHAUSTED reproduced at hidden=128 — an A/B with
        # checkpointing disabled runs clean). Stalling the loop for the
        # transfer (write still backgrounded) is the correct trade there.
        run_dir = os.path.dirname(path)
        link_name = os.path.basename(path)
        self._ckpt_writer.save(
            path, eager_get=self.donate_buffers or _on_axon_platform(),
            params=params, state=state, opt_state=opt_state,
            hparams=vars(task.hparams), meta=meta,
            extra={"rng": np.asarray(jax.device_get(rng))},
            # refresh <task>/last.ckpt (or best.ckpt) only AFTER the file is
            # on disk — linking at enqueue time dangles until the background
            # write finishes (ADVICE r3)
            on_written=lambda: self._link_latest(run_dir, link_name),
        )
        if sync:
            self._ckpt_writer.wait()
        return path

    def _resolve_run_dir(self, task_name: str, resume_from: str | None) -> str:
        """Versioned experiment dir: <root>/<task>/version_N.

        A NEW run allocates the next free version (test-tube's behavior —
        the reference versioned every run under logs_save_path/tt_name,
        /root/reference/src/submit.py:36-37); a RESUMED run stays in the
        version its checkpoint lives in (realpath follows the task-level
        last.ckpt convenience symlink into the right version dir)."""
        task_dir = os.path.join(self.root, task_name)
        if resume_from:
            d = os.path.dirname(os.path.realpath(resume_from))
            # realpath BOTH sides: a symlink inside default_root_dir itself
            # would otherwise break the comparison and silently allocate a
            # fresh version instead of resuming in place (ADVICE r3)
            if re.fullmatch(r"version_\d+", os.path.basename(d)) and (
                os.path.dirname(d) == os.path.realpath(task_dir)
            ):
                return d
        if self.version is not None:
            d = os.path.join(task_dir, f"version_{self.version}")
            os.makedirs(d, exist_ok=True)
            return d
        os.makedirs(task_dir, exist_ok=True)
        existing = [
            int(m.group(1))
            for n in os.listdir(task_dir)
            if (m := re.fullmatch(r"version_(\d+)", n))
        ]
        n = max(existing, default=-1) + 1
        while True:  # mkdir is atomic: concurrent trials can't share a version
            d = os.path.join(task_dir, f"version_{n}")
            try:
                os.mkdir(d)
                return d
            except FileExistsError:
                n += 1

    @staticmethod
    def _link_latest(run_dir: str, name: str) -> None:
        """Refresh <task_dir>/<name> -> version_N/<name> so path-stable
        consumers (run_test --rm_ckpt_path, pretrained_path, emitted sbatch
        resume lines) always see the newest run without knowing versions."""
        task_dir = os.path.dirname(run_dir)
        link = os.path.join(task_dir, name)
        try:
            if os.path.exists(link) and not os.path.islink(link):
                # a REGULAR file here is a pre-versioning checkpoint (the
                # old layout wrote <task>/last.ckpt directly); deleting it
                # would destroy a prior run's only checkpoint — leave it and
                # skip the convenience link (ADVICE r3, medium)
                return
            # atomic swap: create under a temp name, os.replace over the
            # link, so concurrent readers never see a missing path (ADVICE r4)
            tmp = os.path.join(task_dir, f".{name}.tmp{os.getpid()}")
            if os.path.lexists(tmp):
                os.remove(tmp)
            os.symlink(os.path.join(os.path.basename(run_dir), name), tmp)
            os.replace(tmp, link)
        except OSError:
            pass  # convenience only; the versioned path is authoritative

    def fit(self, task, resume_from: str | None = None) -> FitResult:
        run_dir = self._resolve_run_dir(task.name, resume_from)
        logger = MetricsLogger(os.path.join(run_dir, "tb"))
        self._install_preemption_handler()
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)

        params, state = task.init(init_rng)
        tx = self._build_optimizer(task)
        opt_state = tx.init(params)
        start_epoch = 0
        resume_batch = 0
        resume_blob = None
        if resume_from:
            resume_blob = ckpt_io.load(resume_from)
            loaded_params, pruned = _prune_to_template(
                resume_blob["params"], params, f"{task.name} params")
            params = jax.tree.map(jnp.asarray, loaded_params)
            if pruned:
                # e.g. a pre-c3-only detection/spatial checkpoint carrying the
                # full encoder (fc1/fc2/fc_z_out) resumed into a task whose
                # tree now keeps only the conv trunk (ADVICE r3): drop the
                # extra leaves instead of crashing optax with a misleading
                # leaf-count error. Optimizer moments can't be name-matched
                # through the flat saved leaf list, so they restart fresh.
                print(f"[{task.name}] resume: dropped params absent from the "
                      f"current model ({', '.join(sorted(pruned))}); "
                      "optimizer state restarts fresh")
                resume_blob["opt_state"] = None
            if resume_blob.get("state") is not None:
                loaded_state, _ = _prune_to_template(
                    resume_blob["state"], state, f"{task.name} state")
                state = jax.tree.map(jnp.asarray, loaded_state)
            meta = resume_blob.get("meta", {})
            if meta.get("mid_epoch") and "batch_in_epoch" in meta:
                # exact mid-epoch resume: same epoch, skip consumed batches
                start_epoch = int(meta.get("epoch", 0))
                resume_batch = int(meta["batch_in_epoch"])
            else:
                start_epoch = int(meta.get("epoch", -1)) + 1
            self.global_step = int(meta.get("global_step", 0))
            print(f"[{task.name}] resumed from {resume_from}: epoch {start_epoch}"
                  + (f", batch {resume_batch}" if resume_batch else "")
                  + f", global_step {self.global_step}")

        if self.mesh is not None:
            rules = getattr(task, "param_sharding_rules", lambda path, leaf: None)
            pshard = mesh_lib.param_shardings(self.mesh, params, rules)
            params = jax.tree.map(jax.device_put, params, pshard)
            rep = mesh_lib.replicated(self.mesh)
            state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
            opt_state = tx.init(params)

        # train steps are built per freeze-mask signature (frozen stage +
        # unfrozen stage = two compiled programs max; see _make_train_step)
        step_cache: dict = {}
        val_step = self._make_val_step(task)

        best_val = float("inf")
        best_path = last_path = None
        plateau = task.lr_schedule()
        plateau_wait, lr = 0, task.learning_rate()
        scenes_per_sec = 0.0

        if resume_blob is not None:
            # optimizer moments + injected LR (placed on the fresh state's
            # shardings), plateau counters, best-val, and the rng stream —
            # restored after mesh placement so tx.init provides the template
            if resume_blob.get("opt_state") is not None:
                opt_state = ckpt_io.restore_opt_state(opt_state, resume_blob["opt_state"])
            ts = resume_blob.get("meta", {}).get("trainer_state") or {}
            if ts:
                best_val = float(ts.get("best_val", best_val))
                plateau_wait = int(ts.get("plateau_wait", 0))
                lr = float(ts.get("lr", lr))
                hp_dict = _opt_hyperparams(opt_state)
                if hp_dict is not None:
                    hp_dict["learning_rate"] = jnp.asarray(lr)
            extra = resume_blob.get("extra") or {}
            if extra.get("rng") is not None:
                rng = jnp.asarray(np.asarray(extra["rng"]), dtype=jnp.uint32)

        # optional per-STEP program variants (e.g. faster_rcnn's
        # exact-top-k warmup): the task returns a hashable key per global
        # step and swaps its own trace-time state; each (freeze-sig,
        # variant) pair compiles once
        variant_fn = getattr(task, "step_variant", None)

        for epoch in range(start_epoch, self.max_epochs):
            task.current_epoch = epoch
            bool_mask = task.freeze_mask(params, epoch)
            sig = None if bool_mask is None else tuple(
                bool(b) for b in jax.tree.leaves(bool_mask))
            variant = variant_fn(self.global_step) if variant_fn else None
            train_step = step_cache.get((sig, variant))
            if train_step is None:
                train_step = step_cache[(sig, variant)] = self._make_train_step(task, tx, bool_mask)

            # ---- train epoch ----
            loader = task.train_loader()
            if hasattr(loader, "set_epoch"):
                # data order = f(seed, epoch); resume skips consumed batches
                loader.set_epoch(epoch, base_seed=self.seed, skip_batches=resume_batch)
            batch_offset = resume_batch
            resume_batch = 0
            # prefetch straight into the data-parallel layout under a mesh —
            # one host->HBM transfer, already sharded (no re-put per step)
            data_sharding = mesh_lib.batch_sharding(self.mesh) if self.mesh is not None else None
            it = device_prefetch(iter(loader), sharding=data_sharding)
            t0 = time.perf_counter()
            n_scenes = 0
            n_batches = 0
            profiling = False
            t_log, steps_since_log = t0, 0
            for batch_idx, (batch, bmask) in enumerate(it):
                # SURVEY.md §5.1: first-class step profiling. Trace steps
                # [2, 8) of epoch 0 (skipping compile) into --profile_dir for
                # TensorBoard's profiler / xprof.
                if self.profile_dir and epoch == 0:
                    if batch_idx == 2 and not profiling:
                        jax.profiler.start_trace(self.profile_dir)
                        profiling = True
                    elif batch_idx == 8 and profiling:
                        jax.profiler.stop_trace()
                        profiling = False
                # limit counts absolute batch position within the epoch, so a
                # mid-epoch resume (batch_offset > 0) stops where the
                # uninterrupted run would have
                if (
                    self.limit_train_batches is not None
                    and batch_offset + batch_idx >= self.limit_train_batches
                ):
                    break
                if variant_fn is not None:
                    v = variant_fn(self.global_step)
                    if v != variant:
                        variant = v
                        train_step = step_cache.get((sig, variant))
                        if train_step is None:
                            train_step = step_cache[(sig, variant)] = (
                                self._make_train_step(task, tx, bool_mask))
                rng, step_rng = jax.random.split(rng)
                params, opt_state, state, metrics = train_step(
                    params, opt_state, state, batch, step_rng
                )
                bs = jax.tree.leaves(batch)[0].shape[0]
                n_scenes += bs
                n_batches += 1
                steps_since_log += 1
                if self.global_step % self.log_every == 0:
                    # log_scalars float()s each metric, which syncs to this
                    # step's completion — so the elapsed time since the last
                    # log point is real compute wall time, giving avg step
                    # latency without syncing every step (SURVEY.md §5.1
                    # fallback when the profiler is unavailable)
                    scalars = {k: v for k, v in metrics.items()}
                    logger.log_scalars(scalars, self.global_step, prefix="train_")
                    now = time.perf_counter()
                    logger.log_scalars(
                        {"step_ms": (now - t_log) * 1000.0 / steps_since_log},
                        self.global_step,
                    )
                    t_log, steps_since_log = now, 0
                if epoch == start_epoch and batch_idx == 0 and not self._cost_logged:
                    self._cost_logged = True
                    if not os.environ.get("DD_NO_COST_ANALYSIS"):
                        self._log_cost_analysis(
                            train_step, logger,
                            (params, opt_state, state, batch, step_rng),
                        )
                # periodic image logging (reference: every --output_img_freq
                # batches, e.g. autoencoder.py:87-88); runs eagerly off the
                # compiled path at low cadence
                img_freq = getattr(task.hparams, "output_img_freq", 0) or 0
                if img_freq and batch_idx % img_freq == 0:
                    try:
                        images = task.log_images(params, state, batch, step_rng, "train")
                        for name, img in (images or {}).items():
                            logger.log_image(name, np.asarray(img), self.global_step)
                    except NotImplementedError:
                        pass
                self.global_step += 1
                stop_reason = None
                if self.max_steps is not None and self.global_step >= self.max_steps:
                    self._preempted = True  # same clean-stop path as SIGTERM
                    stop_reason = f"max_steps={self.max_steps} reached"
                if self._walltime_exceeded():
                    print(f"[{task.name}] walltime budget reached: checkpointing for resubmit")
                    self._preempted = True
                    stop_reason = "walltime budget reached"
                # mid-epoch / preemption checkpointing (SURVEY.md §5.3)
                if self.enable_checkpointing and (
                    self._preempted
                    or (
                        self.checkpoint_every_n_steps
                        and self.global_step % self.checkpoint_every_n_steps == 0
                    )
                ):
                    self._save_ckpt(
                        os.path.join(run_dir, "last.ckpt"), task, params, state,
                        opt_state, rng,
                        meta={"epoch": epoch, "global_step": self.global_step,
                              "batch_in_epoch": batch_offset + batch_idx + 1,
                              "task": task.name, "mid_epoch": True},
                        best_val=best_val, plateau_wait=plateau_wait, lr=lr,
                        sync=self._preempted,
                    )
                if self._preempted:
                    reason = stop_reason or "preemption signal"
                    saved = "checkpoint saved, " if self.enable_checkpointing else ""
                    print(f"[{task.name}] {reason}: {saved}stopping")
                    logger.close()
                    if self._ckpt_writer is not None:
                        self._ckpt_writer.close()
                        self._ckpt_writer = None
                    # only report a last.ckpt that was actually written: with
                    # checkpointing disabled, a resubmit wrapper trusting this
                    # path would crash on (or silently restart from) a missing
                    # file
                    last = (os.path.join(run_dir, "last.ckpt")
                            if self.enable_checkpointing else last_path)
                    return FitResult(
                        params, state, best_val, best_path, last, scenes_per_sec,
                        stop_reason=reason,
                    )
            if self.profile_dir and profiling:
                jax.profiler.stop_trace()
            jax.tree.map(
                lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                jax.tree.leaves(params)[:1],
            )
            dt = time.perf_counter() - t0
            if n_scenes and dt > 0:
                scenes_per_sec = n_scenes / dt
                logger.log_scalars({"scenes_per_sec": scenes_per_sec, "epoch": epoch}, self.global_step)
            elif n_batches == 0 and batch_offset == 0:
                # loud, not silent: an empty epoch means the split/batch
                # config starved the loader (e.g. scene count too small for
                # the 80/20 split, or batch > divisible size under a mesh).
                # batch_offset > 0 = a mid-epoch resume that already consumed
                # the limit — healthy, not starved.
                print(f"[{task.name}] WARNING: train loader yielded 0 batches "
                      f"in epoch {epoch} (check scene counts vs the 80/20 "
                      f"scene split and batch divisibility)", flush=True)
            if self.enable_progress_bar:
                print(f"[{task.name}] epoch {epoch}: {n_batches} batches, {scenes_per_sec:.2f} scenes/s")

            # ---- validation epoch ----
            val_metrics = self._run_validation(task, val_step, params, state, rng)
            if val_metrics:
                logger.log_scalars(val_metrics, self.global_step)
                if self.enable_progress_bar:
                    vs = ", ".join(f"{k}={float(v):.4f}" for k, v in val_metrics.items())
                    print(f"[{task.name}] epoch {epoch} val: {vs}")

            monitored = float(val_metrics.get("val_loss", np.inf)) if val_metrics else np.inf
            improved = monitored < best_val - 1e-8

            # ---- LR plateau schedule (host-side) ----
            if plateau and val_metrics:
                if improved:
                    plateau_wait = 0
                else:
                    plateau_wait += 1
                    if plateau_wait > plateau.get("plateau_patience", 10):
                        lr *= plateau.get("factor", 0.1)
                        hp_dict = _opt_hyperparams(opt_state)
                        if hp_dict is not None:
                            hp_dict["learning_rate"] = jnp.asarray(lr)
                        plateau_wait = 0
                        logger.log_scalars({"learning_rate": lr}, self.global_step)

            # ---- checkpointing (best tracking runs regardless) ----
            new_best = monitored < best_val
            if new_best:
                best_val = monitored
            if self.enable_checkpointing:
                ck = (params, state, opt_state)
                if new_best and (self.donate_buffers or _on_axon_platform()):
                    # best.ckpt and last.ckpt are identical pytrees at an
                    # epoch boundary; pull to host ONCE so the eager path in
                    # _save_ckpt doesn't transfer the full params + BN state +
                    # Adam moments twice (device_get of host arrays below is
                    # a no-op)
                    ck = jax.device_get(ck)
                meta = {"epoch": epoch, "global_step": self.global_step, "task": task.name}
                if new_best:
                    best_path = os.path.join(run_dir, "best.ckpt")
                    self._save_ckpt(
                        best_path, task, ck[0], ck[1], ck[2], rng, meta=meta,
                        best_val=best_val, plateau_wait=plateau_wait, lr=lr,
                    )
                last_path = os.path.join(run_dir, "last.ckpt")
                self._save_ckpt(
                    last_path, task, ck[0], ck[1], ck[2], rng, meta=meta,
                    best_val=best_val, plateau_wait=plateau_wait, lr=lr,
                )

        logger.close()
        if self._ckpt_writer is not None:
            # every enqueued checkpoint must be on disk before fit returns —
            # callers immediately load best/last (and errors must surface
            # here); close() also joins the worker thread so repeated fits
            # (submit grid trials) don't accumulate writers
            self._ckpt_writer.close()
            self._ckpt_writer = None
        return FitResult(params, state, best_val, best_path, last_path, scenes_per_sec)

    def _run_validation(self, task, val_step, params, state, rng):
        try:
            loader = task.val_loader()
        except NotImplementedError:
            return {}
        sums: dict = {}
        wsum: dict = {}
        ndata = int(self.mesh.shape["data"]) if self.mesh is not None else 1
        data_sharding = mesh_lib.batch_sharding(self.mesh) if self.mesh is not None else None
        host_hook = getattr(task, "host_val_metrics", None)
        for batch_idx, (batch, bmask) in enumerate(iter(loader)):
            if self.limit_val_batches is not None and batch_idx >= self.limit_val_batches:
                break
            k = int(np.sum(bmask))
            if k == 0:
                continue
            bs = len(bmask)
            # Unbiased tail handling: the loader pads the final partial batch
            # with copies; computing the batch-mean metric over pad rows
            # biases the number checkpoint selection keys on. Slice the pads
            # off (one extra jit specialization for the tail shape, amortized
            # across epochs). Under a mesh, keep divisibility by the data
            # axis: at most ndata-1 duplicate rows remain, weighted out of
            # the epoch aggregate.
            m = min(bs, ((k + ndata - 1) // ndata) * ndata)
            if m < bs:
                batch = jax.tree.map(lambda x: x[:m], batch)
            if data_sharding is not None:
                batch = jax.tree.map(lambda x: jax.device_put(x, data_sharding), batch)
            rng, step_rng = jax.random.split(rng)
            metrics = val_step(params, state, batch, step_rng)
            w = float(k)
            for key, v in metrics.items():
                sums[key] = sums.get(key, 0.0) + float(np.asarray(v)) * w
                wsum[key] = wsum.get(key, 0.0) + w
            if host_hook is not None:
                # host-side (non-jittable) metrics, e.g. the polygon-IoU ATS
                # box score (reference: compute_ats_bounding_boxes in the val
                # step, bb_fast_rcnn_w_map.py:139-154). Weights are tracked
                # PER KEY: a batch where the hook returns nothing (e.g. no
                # GT boxes) must not dilute the epoch aggregate, and a hook
                # may return (value, weight) when its mean covers fewer rows
                # than the batch (e.g. val_ats averages only images with GT).
                hm = host_hook(params, state, batch, np.asarray(bmask)[:m]) or {}
                for key, v in hm.items():
                    val, hw = v if isinstance(v, tuple) else (v, w)
                    if hw <= 0:
                        continue
                    sums[key] = sums.get(key, 0.0) + float(val) * float(hw)
                    wsum[key] = wsum.get(key, 0.0) + float(hw)
        if not wsum:
            return {}
        return {k: sums[k] / wsum[k] for k in sums}
