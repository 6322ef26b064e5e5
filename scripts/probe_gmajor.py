"""Perf probe: would storing fc1 in g-major row order (so the latent head
needs NO activation transpose and NO per-call weight shuffle) beat the
current NCHW-flatten path? Weights are random — throughput only.

    python scripts/probe_gmajor.py [--batch 128]
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.core import layers as L
    from driving_dirty_tpu.nn.autoencoder import Encoder

    enable_compilation_cache()
    enc = Encoder(hidden_dim=128, latent_dim=64)
    params, state = enc.init(jax.random.PRNGKey(0))
    head = L.Linear(64, 800 * 800)
    hp_ = head.init(jax.random.PRNGKey(1))
    # fc1 weight already in g-major order (what the layout change would store)
    wg = jax.random.normal(jax.random.PRNGKey(2), (940032, 128), jnp.float32) * 1e-3

    def fwd(params, wg, hp_, x):
        x = x.astype(jnp.bfloat16)
        c1, c2, c3 = enc._convs()
        x = jax.nn.relu(c1.apply(params["c1"], x))
        x = jax.nn.relu(c2.apply(params["c2"], x))
        x = jax.nn.relu(c3.apply(params["c3"], x))
        b, hh, ww, cc = x.shape
        p = jnp.max(x.reshape(b, (hh * ww) // 4, 4, cc), axis=2)
        flat = p.reshape(b, -1)  # g-major, no transpose
        z = jnp.dot(flat, wg.astype(flat.dtype), preferred_element_type=flat.dtype)
        bn = L.BatchNorm(128)
        z, _ = bn.apply(params["fc1"]["bn"], state["fc1"]["bn"], z, train=False)
        z = jax.nn.relu(z)
        from driving_dirty_tpu.nn.autoencoder import DenseBlock

        z, _ = DenseBlock(128, 128).apply(params["fc2"], state["fc2"], z, train=False,
                                          rng=jax.random.PRNGKey(0))
        z = L.Linear(128, 64).apply(params["fc_z_out"], z)
        logits = head.apply(hp_, z).astype(jnp.float32)
        mask = logits > 0
        return mask, jnp.sum(mask)

    f = jax.jit(fwd)
    x = jnp.asarray(np.random.RandomState(0).rand(args.batch, 256, 1836, 3).astype(np.float32))
    for _ in range(3):
        float(f(params, wg, hp_, x)[1])
    inflight = []
    t0 = time.perf_counter()
    for _ in range(args.iters):
        inflight.append(f(params, wg, hp_, x)[1])
        if len(inflight) > 8:
            float(inflight.pop(0))
    for d in inflight:
        float(d)
    dt = time.perf_counter() - t0
    print(f"g-major probe: {args.batch * args.iters / dt:.1f} scenes/s")


if __name__ == "__main__":
    main()
