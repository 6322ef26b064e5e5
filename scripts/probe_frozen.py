"""Frozen-phase train-step cost: mask-array grads vs static stop_gradient.

The reference freezes the pretrained encoder for the first N epochs of every
fine-tune (roadmap_pretrain_ae.py:131, spatial_w_rm.py:148). The trainer's
round-1 implementation multiplies gradients by a 0/1 mask *array* (no
recompile at the unfreeze epoch) — but the backward pass still computes the
full encoder gradient before discarding it. A *static* partition
(stop_gradient on frozen leaves, one recompile at unfreeze) lets XLA prune
the entire encoder backward.

    python scripts/probe_frozen.py [--batch 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--task", type=str, default="roadmap",
                    choices=["roadmap", "spatial_rm", "multitask", "faster_rcnn_rm"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    enable_compilation_cache()
    rng0 = np.random.RandomState(0)
    B = args.batch
    batch = {
        "images": jnp.asarray(rng0.rand(B, 6, 256, 306, 3).astype(np.float32)),
        "road": jnp.asarray((rng0.rand(B, 800, 800) > 0.5).astype(np.float32)),
    }
    common = dict(pretrained_path=None, ae_hidden_dim=128, ae_latent_dim=64,
                  batch_size=B, precision=16, unfreeze_epoch_no=1000)
    if args.task == "roadmap":
        task = RoadMapBCEv2(common)
    else:
        from driving_dirty_tpu.models.spatial_bb import BBSpatialRoadMap
        from driving_dirty_tpu.models.multitask import MultiTask
        from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

        batch.update({
            "boxes": jnp.asarray(rng0.rand(B, 100, 2, 4).astype(np.float32) * 20),
            "box_valid": jnp.asarray(rng0.rand(B, 100) > 0.7),
            "categories": jnp.asarray(rng0.randint(0, 9, (B, 100)), dtype=jnp.int32),
        })
        task = {"spatial_rm": BBSpatialRoadMap, "multitask": MultiTask,
                "faster_rcnn_rm": FasterRCNNRoadMap}[args.task](common)
    params, state = task.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-4)
    bool_mask = task.freeze_mask(params, 0)
    mask_arrays = jax.tree.map(lambda m: jnp.asarray(1.0 if m else 0.0, jnp.float32), bool_mask)

    def make_step(static_mask):
        def step(params, opt_state, state, grad_mask, batch, rng):
            def loss_fn(p):
                if static_mask is not None:
                    p = jax.tree.map(
                        lambda leaf, m: leaf if m else jax.lax.stop_gradient(leaf),
                        p, static_mask)
                loss, (ns, _) = task.loss(p, state, batch, rng, train=True)
                return loss, ns

            (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, ns, loss

        return jax.jit(step)

    def bench(name, step):
        p, s = jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state)
        opt_state = tx.init(p)
        rngs = jax.random.split(jax.random.PRNGKey(1), args.iters + 3)
        for i in range(3):
            p, opt_state, s, loss = step(p, opt_state, s, mask_arrays, batch, rngs[i])
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            p, opt_state, s, loss = step(p, opt_state, s, mask_arrays, batch, rngs[3 + i])
        float(loss)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s}: {dt*1e3:8.2f} ms/step  {B/dt:8.1f} scenes/s  (batch {B})", flush=True)
        return float(loss)

    l1 = bench("frozen mask-array (r1)", make_step(None))
    l2 = bench("frozen static stop_grad", make_step(bool_mask))
    print(f"loss agreement: {l1:.6f} vs {l2:.6f}")


if __name__ == "__main__":
    main()
