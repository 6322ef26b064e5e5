"""Stage-bisect the BasicAE pretraining step on real TPU.

Breaks the 270 ms/step (batch 128, bf16, remat) AE train step into:
fwd-only, fwd+bwd, adam-only, encoder-only fwd+bwd, decoder-only fwd+bwd,
and remat on/off — to find where the time goes before optimizing.

    python scripts/probe_ae_bisect.py [--batch 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.basic_ae import BasicAE

    enable_compilation_cache()
    rng0 = np.random.RandomState(0)
    b = args.batch
    images = jnp.asarray(rng0.rand(b, 6, 256, 306, 3).astype(np.float32))
    batch = {"images": images}
    rng = jax.random.PRNGKey(1)

    def build(remat):
        task = BasicAE(dict(hidden_dim=128, latent_dim=64, batch_size=b,
                            precision=16, remat=remat))
        params, state = task.init(jax.random.PRNGKey(0))
        return task, params, state

    task, params, state = build(True)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def fwd(p, s, rng):
        loss, _ = task.loss(p, s, batch, rng, train=True)
        return loss

    @jax.jit
    def fwd_bwd(p, s, rng):
        def lf(p):
            loss, (ns, _) = task.loss(p, s, batch, rng, train=True)
            return loss, ns
        (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(p)
        return loss, g

    @jax.jit
    def adam_only(p, o, g):
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    @jax.jit
    def full(p, o, s, rng):
        def lf(p):
            loss, (ns, _) = task.loss(p, s, batch, rng, train=True)
            return loss, ns
        (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, ns, loss

    # encoder-only: loss on mean(z); decoder-only: feed fixed latent
    from driving_dirty_tpu.ops.stitch import normalize_images, six_to_one_task

    @jax.jit
    def enc_fwd_bwd(p, s, rng):
        def lf(pe):
            k_mask, k_enc, _ = jax.random.split(rng, 3)
            x = normalize_images(images, task.compute_dtype)
            xm, y = six_to_one_task(x, k_mask, num_maskable=5)
            ap = lambda pp, ss, v: task.encoder.apply(pp, ss, v, train=True, rng=k_enc)
            ap = jax.checkpoint(ap)
            z, se = ap(pe, s["encoder"], xm)
            return jnp.mean(z.astype(jnp.float32) ** 2)
        return jax.value_and_grad(lf)(p["encoder"])

    z0 = jnp.zeros((b, task.latent_dim), task.compute_dtype)

    @jax.jit
    def dec_fwd_bwd(p, s, rng):
        def lf(pd):
            _, _, k_dec = jax.random.split(rng, 3)
            y_hat, _ = task.decoder.apply(pd, s["decoder"], z0, train=True, rng=k_dec)
            return jnp.mean(y_hat.astype(jnp.float32) ** 2)
        return jax.value_and_grad(lf)(p["decoder"])

    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"batch {b}, params {n_params/1e6:.1f}M", flush=True)
    for name, fn, a in [
        ("full step", full, (params, opt_state, state, rng)),
        ("fwd only", fwd, (params, state, rng)),
        ("fwd+bwd", fwd_bwd, (params, state, rng)),
        ("adam only", adam_only, (params, opt_state, jax.tree.map(jnp.zeros_like, params))),
        ("enc fwd+bwd", enc_fwd_bwd, (params, state, rng)),
        ("dec fwd+bwd", dec_fwd_bwd, (params, state, rng)),
    ]:
        dt = timeit(fn, *a)
        print(f"{name:15s}: {dt*1e3:8.2f} ms  ({b/dt:7.1f} scenes/s)", flush=True)

    # remat off
    task2, params2, state2 = build(False)

    @jax.jit
    def fwd_bwd2(p, s, rng):
        def lf(p):
            loss, (ns, _) = task2.loss(p, s, batch, rng, train=True)
            return loss, ns
        (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(p)
        return loss, g

    try:
        dt = timeit(fwd_bwd2, params2, state2, rng)
        print(f"{'fwd+bwd noremat':15s}: {dt*1e3:8.2f} ms  ({b/dt:7.1f} scenes/s)", flush=True)
    except Exception as e:
        # XLA resource exhaustion is expected at large batch; anything else
        # (API drift, shape bug) must stay distinguishable — print the message
        print(f"fwd+bwd noremat: failed ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
