"""Training-step throughput on real TPU: AE pretraining (BASELINE config 2)
and roadmap fine-tune (config 3), compiled step on device-resident data.

    python scripts/probe_train.py [--batch 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--remat", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.basic_ae import BasicAE
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    enable_compilation_cache()
    rng0 = np.random.RandomState(0)

    def bench_task(name, task, batch, lr=1e-3):
        params, state = task.init(jax.random.PRNGKey(0))
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, state, batch, rng):
            def loss_fn(p):
                loss, (new_state, aux) = task.loss(p, state, batch, rng, train=True)
                return loss, new_state
            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_state, loss

        rngs = jax.random.split(jax.random.PRNGKey(1), args.iters + 3)
        # warmup/compile
        for i in range(3):
            params, opt_state, state, loss = step(params, opt_state, state, batch, rngs[i])
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt_state, state, loss = step(params, opt_state, state, batch, rngs[3 + i])
        float(loss)
        dt = (time.perf_counter() - t0) / args.iters
        bs = jax.tree.leaves(batch)[0].shape[0]
        print(f"{name:14s}: {dt*1e3:8.2f} ms/step  {bs/dt:8.1f} scenes/s  (batch {bs})", flush=True)

    images = jnp.asarray(rng0.rand(args.batch, 6, 256, 306, 3).astype(np.float32))
    road = jnp.asarray((rng0.rand(args.batch, 800, 800) > 0.5).astype(np.float32))

    ae = BasicAE(dict(hidden_dim=128, latent_dim=64, batch_size=args.batch, precision=16, remat=bool(args.remat)))
    bench_task("basic_ae", ae, {"images": images}, lr=1e-3)

    rm = RoadMapBCEv2(dict(pretrained_path=None, ae_hidden_dim=128, ae_latent_dim=64,
                           batch_size=args.batch, precision=16, unfreeze_epoch_no=0,
                           remat=bool(args.remat)))
    bench_task("roadmap_bce", rm, {"images": images, "road": road}, lr=1e-4)


if __name__ == "__main__" and "--extended" not in sys.argv:
    main()


def extended():
    """Train-step throughput for the remaining families (configs 4-5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.spatial_bb import BBSpatialRoadMap
    from driving_dirty_tpu.models.multitask import MultiTask
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap
    import argparse, time

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--extended", action="store_true")
    args, _ = ap.parse_known_args()
    enable_compilation_cache()
    B = args.batch
    rng0 = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng0.randint(0, 256, (B, 6, 256, 306, 3), np.uint8)),
        "road": jnp.asarray((rng0.rand(B, 800, 800) > 0.5).astype(np.float32)),
        "boxes": jnp.asarray(rng0.rand(B, 100, 2, 4).astype(np.float32) * 20),
        "box_valid": jnp.asarray(rng0.rand(B, 100) > 0.7),
        "categories": jnp.asarray(rng0.randint(0, 9, (B, 100)), dtype=jnp.int32),
    }
    common = dict(pretrained_path=None, ae_hidden_dim=128, ae_latent_dim=64,
                  precision=16, batch_size=B, unfreeze_epoch_no=0)

    for name, task in [("spatial_rm", BBSpatialRoadMap(common)),
                       ("multitask", MultiTask(common)),
                       ("faster_rcnn_rm", FasterRCNNRoadMap(common))]:
        params, state = task.init(jax.random.PRNGKey(0))
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, state, batch, rng):
            def loss_fn(p):
                loss, (ns, _) = task.loss(p, state, batch, rng, train=True)
                return loss, ns
            (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, ns, loss

        rngs = jax.random.split(jax.random.PRNGKey(1), args.iters + 2)
        for i in range(2):
            params, opt_state, state, loss = step(params, opt_state, state, batch, rngs[i])
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt_state, state, loss = step(params, opt_state, state, batch, rngs[2 + i])
        float(loss)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:14s}: {dt*1e3:8.2f} ms/step  {B/dt:8.1f} scenes/s  (batch {B})", flush=True)


if __name__ == "__main__" and "--extended" in sys.argv:
    extended()
    sys.exit(0)
