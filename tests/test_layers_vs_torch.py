"""Cross-check core layer numerics against torch CPU.

The reference implements its models with torch.nn layers
(/root/reference/src/autoencoder/components.py,
 /root/reference/src/bounding_box_model/spatial_bb/components.py); these tests
pin our NHWC/HWIO implementations to identical outputs so that imported
reference checkpoints reproduce bit-comparable results (BASELINE.json parity
requirement).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from driving_dirty_tpu.core import layers as L


def _to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _from_nhwc(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


# Every (k, s, p, d, op) conv config used anywhere in the reference model zoo.
CONV_CONFIGS = [
    # encoder c1/c2/c3: components.py:19-21
    dict(cin=3, cout=8, k=3, s=1, p=1, d=1),
    dict(cin=8, cout=8, k=3, s=2, p=1, d=1),
    # spatial mapping: spatial_bb/components.py:18-26
    dict(cin=3, cout=8, k=(52, 1), s=(3, 2), p=1, d=1),
    dict(cin=3, cout=8, k=(1, 50), s=(3, 2), p=0, d=1),
    dict(cin=8, cout=8, k=3, s=1, p=0, d=1),
    # ss_conv: spatial_bb/components.py:87
    dict(cin=8, cout=8, k=(1, 24), s=(1, 7), p=0, d=1),
    # rm convs: spatial_bb/components.py:132-133
    dict(cin=1, cout=8, k=7, s=3, p=1, d=3),
    dict(cin=8, cout=8, k=3, s=1, p=0, d=3),
    # mapper_cnn: bb_fast_rcnn_w_map.py:71
    dict(cin=4, cout=3, k=3, s=1, p=1, d=1),
]

CONVT_CONFIGS = [
    # decoder dc1..dc4: components.py:70-73
    dict(cin=8, cout=4, k=3, s=1, p=1, op=0, d=1),
    dict(cin=4, cout=4, k=2, s=2, p=0, op=0, d=1),
    dict(cin=4, cout=3, k=1, s=1, p=0, op=0, d=1),
    # merging CNN upsamples: spatial_bb/components.py:88-93
    dict(cin=4, cout=4, k=2, s=2, p=0, op=0, d=1),
    dict(cin=4, cout=4, k=8, s=1, p=0, op=0, d=8),
    dict(cin=4, cout=4, k=6, s=1, p=0, op=2, d=6),
    dict(cin=4, cout=4, k=7, s=1, p=0, op=0, d=7),
    dict(cin=4, cout=4, k=7, s=1, p=0, op=0, d=3),
]


@pytest.mark.parametrize("cfg", CONV_CONFIGS)
def test_conv2d_matches_torch(cfg):
    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg["cin"], 64, 70).astype(np.float32)
    tconv = torch.nn.Conv2d(
        cfg["cin"], cfg["cout"], cfg["k"], stride=cfg["s"], padding=cfg["p"], dilation=cfg["d"]
    )
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    ours = L.Conv2d(cfg["cin"], cfg["cout"], cfg["k"], cfg["s"], cfg["p"], cfg["d"])
    w = tconv.weight.detach().numpy()  # OIHW
    params = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(tconv.bias.detach().numpy())}
    got = _from_nhwc(np.asarray(ours.apply(params, jnp.asarray(_to_nhwc(x)))))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cfg", CONVT_CONFIGS)
def test_convtranspose2d_matches_torch(cfg):
    rng = np.random.RandomState(1)
    x = rng.randn(2, cfg["cin"], 30, 34).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(
        cfg["cin"], cfg["cout"], cfg["k"], stride=cfg["s"], padding=cfg["p"],
        output_padding=cfg["op"], dilation=cfg["d"],
    )
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    ours = L.ConvTranspose2d(
        cfg["cin"], cfg["cout"], cfg["k"], cfg["s"], cfg["p"], cfg["op"], cfg["d"]
    )
    w = tconv.weight.detach().numpy()  # [in, out, kh, kw]
    params = {"w": jnp.asarray(np.transpose(w, (2, 3, 0, 1))), "b": jnp.asarray(tconv.bias.detach().numpy())}
    got = _from_nhwc(np.asarray(ours.apply(params, jnp.asarray(_to_nhwc(x)))))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_linear_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 13).astype(np.float32)
    tl = torch.nn.Linear(13, 7)
    with torch.no_grad():
        ref = tl(torch.from_numpy(x)).numpy()
    ours = L.Linear(13, 7)
    params = {"w": jnp.asarray(tl.weight.detach().numpy().T), "b": jnp.asarray(tl.bias.detach().numpy())}
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_batchnorm_train_and_eval_match_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(6, 5).astype(np.float32) * 3 + 1
    tbn = torch.nn.BatchNorm1d(5)
    tbn.train()
    with torch.no_grad():
        ref_train = tbn(torch.from_numpy(x)).numpy()
    bn = L.BatchNorm(5)
    params = {"scale": jnp.ones(5), "bias": jnp.zeros(5)}
    state = bn.init_state()
    got_train, new_state = bn.apply(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got_train), ref_train, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    tbn.eval()
    x2 = rng.randn(4, 5).astype(np.float32)
    with torch.no_grad():
        ref_eval = tbn(torch.from_numpy(x2)).numpy()
    got_eval, _ = bn.apply(params, new_state, jnp.asarray(x2), train=False)
    np.testing.assert_allclose(np.asarray(got_eval), ref_eval, rtol=1e-4, atol=1e-4)


def test_max_pool_flat_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 4096).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.max_pool1d(torch.from_numpy(x).unsqueeze(1), kernel_size=4).squeeze(1).numpy()
    got = np.asarray(L.max_pool_flat(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, ref)


def test_dropout_scaling_and_determinism():
    x = jnp.ones((512, 64))
    key = jax.random.PRNGKey(0)
    y = L.dropout(key, x, 0.2, train=True)
    assert np.isclose(float(jnp.mean(y)), 1.0, atol=0.05)
    assert np.allclose(np.asarray(L.dropout(key, x, 0.2, train=False)), np.asarray(x))
