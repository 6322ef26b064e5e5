"""Micro-probe: cost of the gather-backward scatter in the RPN reg loss.

probe_det_train's stage bisect showed that merely touching d[idx]
(256 sampled rows of the [2.4M, 4] RPN deltas) adds ~70 ms to a 16-image
train step — the gather is free, its transpose (XLA scatter-add with
potentially-duplicate indices) is not. Variants:

  plain    loss via x[idx]            (jnp gather; VJP = scatter-add)
  unique   loss via take_rows(x, idx) (custom VJP: scatter-SET through
           provably-unique indices — filler slots routed to trash rows)
  onehot   loss via onehot @ x blocked matmul (MXU; no scatter at all)

    python scripts/probe_scatter.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 2_400_000
S = 256
B = 16
C = 4


@jax.custom_vjp
def _take_rows(x, idx, safe):
    return x[idx]


def _take_rows_fwd(x, idx, safe):
    return x[idx], (x.shape, safe)


def _take_rows_bwd(res, g):
    shape, safe = res
    n = shape[0]
    pad = jnp.zeros((n + safe.shape[0],) + shape[1:], g.dtype)
    return (pad.at[safe].set(g, unique_indices=True)[:n], None, None)


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def take_rows_unique(x, idx, take):
    """x[idx] with a scatter-set backward through unique indices."""
    n = x.shape[0]
    safe = jnp.where(take, idx, n + jnp.arange(idx.shape[0], dtype=idx.dtype))
    return _take_rows(x, idx, safe)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
    idx = jnp.asarray(
        np.stack([rng.choice(N, S, replace=False) for _ in range(B)]).astype(np.int32))
    take = jnp.asarray(rng.rand(B, S) > 0.2)

    def loss_plain(x):
        v = jax.vmap(lambda xx, ii: xx[ii])(x, idx)
        return jnp.sum(v * take[..., None])

    def loss_unique(x):
        v = jax.vmap(take_rows_unique)(x, idx, take)
        return jnp.sum(v * take[..., None])

    for name, fn in [("plain", loss_plain), ("unique", loss_unique)]:
        g = jax.jit(jax.grad(fn))
        r = g(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = g(x)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name:8s}: {dt*1e3:8.2f} ms/grad  (B={B}, N={N}, S={S})", flush=True)

    # numerical equivalence
    gp = jax.jit(jax.grad(loss_plain))(x)
    gu = jax.jit(jax.grad(loss_unique))(x)
    err = float(jnp.max(jnp.abs(gp - gu)))
    print(f"max |grad diff| = {err:.2e}")


if __name__ == "__main__":
    main()
