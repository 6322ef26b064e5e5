"""Minimal repro probe for the faster_rcnn_rm TPU train-step worker crash
(seen via cli.faster_rcnn at batch 2 on 2026-08-17). One jitted
loss+grad+adam step on random data, no Trainer, no data pipeline.

RESOLVED: every probe config passed because this script always built the
split (non-donated) programs, while the CLI ran the fused+donated train
step — the Trainer's axon guard keyed on jax.default_backend(), which
reports plain 'tpu' on the tunneled platform, so donation stayed on and
crashed the worker. Fixed in train/trainer.py (_on_axon_platform checks
JAX_PLATFORMS); kept as the harness for isolating trainer-vs-probe program
deltas (see also the HLO diff method: jit(...).lower().as_text() compare).

    python scripts/probe_fr_crash.py [--batch 2] [--no_grad] [--loss_only]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--no_grad", action="store_true", help="forward loss only")
    ap.add_argument("--mode", default="fused",
                    choices=["fused", "split", "split_nodonate"],
                    help="fused = one jit (probe baseline); split = the "
                         "Trainer's axon path (jg + ju with donated grads, "
                         "grad_mask, inject_hyperparams)")
    ap.add_argument("--precision", type=int, default=16, choices=[8, 16, 32])
    ap.add_argument("--remat", type=int, default=None, choices=[0, 1])
    ap.add_argument("--real_data", default=None,
                    help="path to a synthetic dataset; batches come from the "
                         "real Loader instead of random arrays")
    ap.add_argument("--prefetch", action="store_true",
                    help="with --real_data: iterate device_prefetch(loader) "
                         "exactly like Trainer.fit (threaded device_put "
                         "overlapping execution)")
    ap.add_argument("--trainer_rng", type=int, default=None,
                    help="replicate the Trainer's exact rng chain + shuffle "
                         "for this seed (e.g. 20200505)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ae_hidden_dim", type=int, default=128)
    ap.add_argument("--ae_latent_dim", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    enable_compilation_cache()
    B = args.batch
    rng0 = np.random.RandomState(args.seed)
    batch = {
        "images": jnp.asarray(rng0.randint(0, 256, (B, 6, 256, 306, 3), np.uint8)),
        "road": jnp.asarray((rng0.rand(B, 800, 800) > 0.5).astype(np.float32)),
        "boxes": jnp.asarray(rng0.rand(B, 100, 2, 4).astype(np.float32) * 20),
        "box_valid": jnp.asarray(rng0.rand(B, 100) > 0.7),
        "categories": jnp.asarray(rng0.randint(0, 9, (B, 100)), dtype=jnp.int32),
    }
    # unfreeze default 10 == the CLI's crash config (encoder frozen at epoch 0)
    unfreeze = 10 if args.mode in ("split", "split_nodonate") else 0
    hparams = dict(pretrained_path=None, ae_hidden_dim=args.ae_hidden_dim,
                   ae_latent_dim=args.ae_latent_dim, precision=args.precision,
                   batch_size=B, unfreeze_epoch_no=unfreeze)
    if args.remat is not None:
        hparams["remat"] = bool(args.remat)
    if args.real_data:
        hparams.update(link=args.real_data, samples_per_scene=4,
                       num_labeled_scenes=2)
    if args.trainer_rng is not None:
        hparams["seed"] = args.trainer_rng  # scene-split seed, like the CLI
    task = FasterRCNNRoadMap(hparams)
    if args.real_data:
        b, _ = next(iter(task.train_loader()))
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        print({k: (v.shape, str(v.dtype)) for k, v in batch.items()}, flush=True)
    params, state = task.init(jax.random.PRNGKey(0))
    if args.mode in ("split", "split_nodonate"):
        # mirror Trainer._make_train_step's axon split path exactly
        from driving_dirty_tpu.train.trainer import (
            _bool_mask_to_arrays, _tree_ones_mask)

        tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
        opt_state = tx.init(params)
        bool_mask = task.freeze_mask(params, 0)
        grad_mask = (_tree_ones_mask(params) if bool_mask is None
                     else _bool_mask_to_arrays(params, bool_mask))

        def grad_fn(params, state, batch, rng):
            def loss_fn(p):
                loss, (ns, metrics) = task.loss(p, state, batch, rng, train=True)
                return loss, (ns, metrics)
            (loss, (ns, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return grads, ns, metrics

        def update_fn(params, opt_state, grads, gm):
            grads = jax.tree.map(lambda g, m: g * m, grads, gm)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        jg = jax.jit(grad_fn)
        ju = (jax.jit(update_fn, donate_argnums=(2,)) if args.mode == "split"
              else jax.jit(update_fn))

        t0 = time.perf_counter()
        if args.trainer_rng is not None:
            # exact Trainer rng chain: PRNGKey(seed) -> split init ->
            # split per step; and the exact set_epoch shuffle order
            run_rng = jax.random.PRNGKey(args.trainer_rng)
            run_rng, init_rng = jax.random.split(run_rng)
            params, state = task.init(init_rng)
            opt_state = tx.init(params)
            step_rngs = []
            for _ in range(8):
                run_rng, sr = jax.random.split(run_rng)
                step_rngs.append(sr)
            rngs = step_rngs
        else:
            rngs = list(jax.random.split(jax.random.PRNGKey(1), 8))
        if args.prefetch and args.real_data:
            from driving_dirty_tpu.data.pipeline import device_prefetch
            loader = task.train_loader()
            if args.trainer_rng is not None and hasattr(loader, "set_epoch"):
                loader.set_epoch(0, base_seed=args.trainer_rng, skip_batches=0)
            it = device_prefetch(iter(loader))
            for i, (b, _) in enumerate(it):
                grads, state, metrics = jg(params, state, b, rngs[i])
                params, opt_state = ju(params, opt_state, grads, grad_mask)
                print(f"step {i}: loss={float(metrics['loss']):.4f}"
                      f"  t={time.perf_counter()-t0:.1f}s", flush=True)
        else:
            for i in range(3):
                grads, state, metrics = jg(params, state, batch, rngs[i])
                params, opt_state = ju(params, opt_state, grads, grad_mask)
                print(f"step {i}: loss={float(metrics['loss']):.4f}"
                      f"  t={time.perf_counter()-t0:.1f}s", flush=True)
        print("OK", flush=True)
        return
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    if args.no_grad:
        @jax.jit
        def step(params, opt_state, state, batch, rng):
            loss, (ns, _) = task.loss(params, state, batch, rng, train=True)
            return params, opt_state, ns, loss
    else:
        @jax.jit
        def step(params, opt_state, state, batch, rng):
            def loss_fn(p):
                loss, (ns, _) = task.loss(p, state, batch, rng, train=True)
                return loss, ns
            (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, ns, loss

    t0 = time.perf_counter()
    rngs = jax.random.split(jax.random.PRNGKey(1), 3)
    for i in range(3):
        params, opt_state, state, loss = step(params, opt_state, state, batch, rngs[i])
        print(f"step {i}: loss={float(loss):.4f}  t={time.perf_counter()-t0:.1f}s",
              flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
