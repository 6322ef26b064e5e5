"""Blocked (space-to-depth) conv fast path == plain conv, exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from driving_dirty_tpu.core.layers import Conv2d
from driving_dirty_tpu.nn.autoencoder import Encoder
from driving_dirty_tpu.ops import fastconv


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_space_to_depth_roundtrip():
    x = _rand(0, (2, 8, 12, 5))
    np.testing.assert_array_equal(
        np.asarray(fastconv.depth_to_space(fastconv.space_to_depth(x))), np.asarray(x)
    )


@pytest.mark.parametrize("cin,cout", [(3, 32), (32, 32)])
def test_blocked_s1_matches_plain_conv(cin, cout):
    conv = Conv2d(cin, cout, 3, 1, 1)
    p = conv.init(jax.random.PRNGKey(1))
    x = _rand(2, (2, 16, 24, cin))
    ref = conv.apply(p, x)
    got = fastconv.conv3x3_s1_blocked(x, p["w"], p["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_blocked_s2_matches_plain_conv():
    conv = Conv2d(32, 32, 3, 2, 1)
    p = conv.init(jax.random.PRNGKey(3))
    x = _rand(4, (2, 16, 24, 32))
    ref = conv.apply(p, x)
    got = fastconv.conv3x3_s2_blocked(x, p["w"], p["b"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_encoder_fast_head_matches_apply():
    # transpose-free latent head (NHWC pool + folded dot_general) == standard
    enc = Encoder(hidden_dim=8, latent_dim=8, input_height=16, input_width=6 * 4)
    params, state = enc.init(jax.random.PRNGKey(0))
    x = _rand(7, (2, 16, 24, 3))
    rng = jax.random.PRNGKey(1)
    ref, ref_state = enc.apply(params, state, x, train=False, rng=rng)
    got, got_state = enc.apply(params, state, x, train=False, rng=rng, fast_head=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
    # BN state updates agree in train mode too
    _, s_ref = enc.apply(params, state, x, train=True, rng=rng)
    _, s_got = enc.apply(params, state, x, train=True, rng=rng, fast_head=True)
    for a, b in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_encoder_trunk_blocked_matches_apply():
    enc = Encoder(hidden_dim=8, latent_dim=8, input_height=16, input_width=6 * 4)
    params, state = enc.init(jax.random.PRNGKey(0))
    x = _rand(5, (2, 16, 24, 3))
    ref, _ = enc.apply(params, state, x, train=False, rng=jax.random.PRNGKey(1), c3_only=True)
    got = fastconv.encoder_convs_blocked(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
