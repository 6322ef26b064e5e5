"""Parity tests for the fused Pallas encoder conv trunk (pallas/trunk.py).

Runs in interpret mode on the virtual-CPU test mesh; the same kernel code
compiles through Mosaic on TPU (exercised by bench.py / the roadmap
inference path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from driving_dirty_tpu.pallas.trunk import fused_trunk, xla_trunk


def _rand_args(rng, cin=3):
    shapes = [(3, 3, cin, 32), (32,), (3, 3, 32, 32), (32,), (3, 3, 32, 32), (32,)]
    return [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2) for s in shapes]


@pytest.mark.parametrize("hw", [(16, 24), (32, 48), (8, 306)])
def test_fused_trunk_matches_xla(hw):
    rng = np.random.RandomState(0)
    h, w = hw
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    args = _rand_args(rng)
    ref = xla_trunk(x, *args)
    out = fused_trunk(x, *args)
    assert out.shape == (2, h // 2, w // 2, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fused_trunk_grad_matches_xla():
    """The custom VJP routes backward through the XLA trunk."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32))
    args = _rand_args(rng)

    gf = jax.grad(lambda *a: jnp.sum(fused_trunk(*a) ** 2), argnums=(0, 1, 3, 5))
    gx = jax.grad(lambda *a: jnp.sum(xla_trunk(*a) ** 2), argnums=(0, 1, 3, 5))
    for a, b in zip(gf(x, *args), gx(x, *args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_encoder_apply_fused_flag():
    """Encoder.apply(fused=True) equals the plain path on the same params."""
    from driving_dirty_tpu.nn.autoencoder import Encoder

    enc = Encoder(hidden_dim=16, latent_dim=8, input_height=16, input_width=24)
    params, state = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(2).rand(2, 16, 24, 3).astype(np.float32))
    ref, _ = enc.apply(params, state, x, train=False, rng=jax.random.PRNGKey(1),
                       c3_only=True, fused=False)
    out, _ = enc.apply(params, state, x, train=False, rng=jax.random.PRNGKey(1),
                       c3_only=True, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)
