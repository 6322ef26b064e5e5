"""End-to-end numerical parity of the NN components against torch modules
built from the documented reference architecture (SURVEY.md §2.3, §2.6) with
weights copied across. This pins the subtle bits: NCHW flatten order before
max_pool1d, decoder reshape order, rot90/flip orientations, concat layout.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from driving_dirty_tpu.nn.autoencoder import Decoder, DenseBlock, Encoder  # noqa: E402
from driving_dirty_tpu.nn.spatial import (  # noqa: E402
    BoxesMergingCNN,
    RoadMapBoxesMergingCNN,
    SpatialMappingCNN,
)

KEY = jax.random.PRNGKey(0)


def t2j_conv(tconv):
    p = {"w": jnp.asarray(np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0)))}
    if tconv.bias is not None:
        p["b"] = jnp.asarray(tconv.bias.detach().numpy())
    return p


def t2j_convT(tconv):
    return {
        "w": jnp.asarray(np.transpose(tconv.weight.detach().numpy(), (2, 3, 0, 1))),
        "b": jnp.asarray(tconv.bias.detach().numpy()),
    }


def t2j_linear(tl):
    return {"w": jnp.asarray(tl.weight.detach().numpy().T), "b": jnp.asarray(tl.bias.detach().numpy())}


def t2j_bn(tbn):
    return (
        {"scale": jnp.asarray(tbn.weight.detach().numpy()), "bias": jnp.asarray(tbn.bias.detach().numpy())},
        {"mean": jnp.asarray(tbn.running_mean.numpy()), "var": jnp.asarray(tbn.running_var.numpy())},
    )


def nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


class TorchEncoder(torch.nn.Module):
    # Architecture per /root/reference/src/autoencoder/components.py:6-52
    # (fresh implementation of the documented spec for cross-checking).
    def __init__(self, hidden, latent, cin, h, w):
        super().__init__()
        self.c1 = torch.nn.Conv2d(cin, 32, 3, padding=1)
        self.c2 = torch.nn.Conv2d(32, 32, 3, padding=1)
        self.c3 = torch.nn.Conv2d(32, 32, 3, stride=2, padding=1)
        cod = 32 * ((h + 1) // 2) * ((w + 1) // 2) // 4
        self.fc1_lin = torch.nn.Linear(cod, hidden)
        self.fc1_bn = torch.nn.BatchNorm1d(hidden)
        self.fc2_lin = torch.nn.Linear(hidden, hidden)
        self.fc2_bn = torch.nn.BatchNorm1d(hidden)
        self.fc_z = torch.nn.Linear(hidden, latent)

    def forward(self, x, c3_only=False):
        x = TF.relu(self.c1(x))
        x = TF.relu(self.c2(x))
        x = TF.relu(self.c3(x))
        if c3_only:
            return x
        x = x.reshape(x.size(0), -1).unsqueeze(1)
        x = TF.max_pool1d(x, kernel_size=4).squeeze(1)
        x = TF.relu(self.fc1_bn(self.fc1_lin(x)))
        x = TF.relu(self.fc2_bn(self.fc2_lin(x)))
        return self.fc_z(x)


def _encoder_pair(hidden=8, latent=6, h=64, w=96):
    enc = Encoder(hidden, latent, 3, h, w)
    params, state = enc.init(KEY)
    t = TorchEncoder(hidden, latent, 3, h, w).eval()
    params["c1"], params["c2"], params["c3"] = t2j_conv(t.c1), t2j_conv(t.c2), t2j_conv(t.c3)
    params["fc1"]["fc"] = t2j_linear(t.fc1_lin)
    params["fc1"]["bn"], state["fc1"]["bn"] = t2j_bn(t.fc1_bn)
    params["fc2"]["fc"] = t2j_linear(t.fc2_lin)
    params["fc2"]["bn"], state["fc2"]["bn"] = t2j_bn(t.fc2_bn)
    params["fc_z_out"] = t2j_linear(t.fc_z)
    return enc, params, state, t


def test_encoder_matches_torch_full_path():
    enc, params, state, t = _encoder_pair()
    x = np.random.RandomState(0).randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    got, _ = enc.apply(params, state, nhwc(x), train=False, rng=KEY)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_encoder_c3_only_matches_torch():
    enc, params, state, t = _encoder_pair()
    x = np.random.RandomState(1).randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x), c3_only=True).numpy()
    got, _ = enc.apply(params, state, nhwc(x), train=False, rng=KEY, c3_only=True)
    assert nchw(got).shape == ref.shape == (2, 32, 32, 48)
    np.testing.assert_allclose(nchw(got), ref, rtol=1e-3, atol=1e-4)


def test_encoder_conv_out_dim_reference_value():
    # SURVEY.md hard-part 5: 256x1836 input -> c3 map 32x128x918 ->
    # flat 3,760,128 -> pool 4 -> 940,032.
    assert Encoder(128, 64).conv_out_dim() == 940032
    assert Encoder(128, 64).c3_shape() == (128, 918)


class TorchDecoder(torch.nn.Module):
    # Architecture per /root/reference/src/autoencoder/components.py:55-93.
    def __init__(self, hidden, latent, cin, oh, ow):
        super().__init__()
        self.h, self.w = oh // 2, ow // 2
        self.fc1_lin = torch.nn.Linear(latent, hidden)
        self.fc1_bn = torch.nn.BatchNorm1d(hidden)
        self.fc2_lin = torch.nn.Linear(hidden, self.h * self.w * 64)
        self.fc2_bn = torch.nn.BatchNorm1d(self.h * self.w * 64)
        self.dc1 = torch.nn.ConvTranspose2d(64, 32, 3, padding=1)
        self.dc2 = torch.nn.ConvTranspose2d(32, 32, 3, padding=1)
        self.dc3 = torch.nn.ConvTranspose2d(32, 32, 2, stride=2)
        self.dc4 = torch.nn.ConvTranspose2d(32, cin, 1, stride=1)

    def forward(self, z):
        x = TF.relu(self.fc1_bn(self.fc1_lin(z)))
        x = TF.relu(self.fc2_bn(self.fc2_lin(x)))
        x = x.view(x.size(0), 64, self.h, self.w)
        x = TF.relu(self.dc1(x))
        x = TF.relu(self.dc2(x))
        x = TF.relu(self.dc3(x))
        return self.dc4(x)


def test_decoder_matches_torch():
    hidden, latent, oh, ow = 8, 6, 32, 40
    dec = Decoder(hidden, latent, 3, oh, ow)
    params, state = dec.init(KEY)
    t = TorchDecoder(hidden, latent, 3, oh, ow).eval()
    assert dec.deconv_dims == (t.h, t.w)
    params["fc1"]["fc"] = t2j_linear(t.fc1_lin)
    params["fc1"]["bn"], state["fc1"]["bn"] = t2j_bn(t.fc1_bn)
    params["fc2"]["fc"] = t2j_linear(t.fc2_lin)
    params["fc2"]["bn"], state["fc2"]["bn"] = t2j_bn(t.fc2_bn)
    for i in (1, 2, 3, 4):
        params[f"dc{i}"] = t2j_convT(getattr(t, f"dc{i}"))
    z = np.random.RandomState(2).randn(2, latent).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(z)).numpy()
    got, _ = dec.apply(params, state, jnp.asarray(z), train=False, rng=KEY)
    assert nchw(got).shape == ref.shape == (2, 3, oh, ow)
    np.testing.assert_allclose(nchw(got), ref, rtol=1e-3, atol=1e-4)


class TorchSpatialMapping(torch.nn.Module):
    # Architecture per /root/reference/src/bounding_box_model/spatial_bb/components.py:6-77.
    def __init__(self):
        super().__init__()
        self.f_conv = torch.nn.Conv2d(3, 32, (52, 1), (3, 2), padding=1)
        self.b_conv = torch.nn.Conv2d(3, 32, (52, 1), (3, 2), padding=1)
        for n in ("fl", "fr", "bl", "br"):
            setattr(self, f"{n}_conv", torch.nn.Conv2d(3, 32, (1, 50), (3, 2)))
        self.out_conv = torch.nn.Conv2d(32, 32, 3)

    def forward(self, x):
        bl = TF.relu(self.bl_conv(x[:, 3]))
        fl = TF.relu(self.fl_conv(x[:, 0]))
        b = TF.relu(self.b_conv(torch.rot90(x[:, 4], 1, [2, 3])))
        f = TF.relu(self.f_conv(torch.rot90(x[:, 1], 1, [3, 2])))
        br = TF.relu(self.br_conv(torch.flip(x[:, 5], [2, 3])))
        fr = TF.relu(self.fr_conv(torch.flip(x[:, 2], [2, 3])))
        top = torch.cat([bl, fl], dim=3)
        mid = torch.cat([b, f], dim=3)
        bottom = torch.cat([br, fr], dim=3)
        return TF.relu(self.out_conv(torch.cat([top, mid, bottom], dim=2)))


def test_spatial_mapping_matches_torch():
    sm = SpatialMappingCNN()
    params, _ = sm.init(KEY)
    t = TorchSpatialMapping().eval()
    for n in ("f_conv", "b_conv", "fl_conv", "fr_conv", "bl_conv", "br_conv", "out_conv"):
        params[n] = t2j_conv(getattr(t, n))
    x = np.random.RandomState(3).randn(1, 6, 3, 256, 306).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    got, _ = sm.apply(params, {}, x_nhwc)
    assert nchw(got).shape == ref.shape == (1, 32, 256, 256)
    np.testing.assert_allclose(nchw(got), ref, rtol=1e-3, atol=1e-4)


def test_merging_cnn_shapes():
    # Reference dims: ssr [b,32,128,918] + spatial [b,32,256,256] -> [b,1,800,800]
    bm = BoxesMergingCNN()
    params, _ = bm.init(KEY)
    ssr = jnp.zeros((1, 128, 918, 32))
    sp = jnp.zeros((1, 256, 256, 32))
    out, _ = bm.apply(params, {}, ssr, sp)
    assert out.shape == (1, 800, 800, 1)


def test_roadmap_merging_cnn_shapes():
    bm = RoadMapBoxesMergingCNN()
    params, _ = bm.init(KEY)
    ssr = jnp.zeros((1, 128, 918, 32))
    sp = jnp.zeros((1, 256, 256, 32))
    rm = jnp.zeros((1, 800, 800, 1))
    out, _ = bm.apply(params, {}, ssr, sp, rm)
    assert out.shape == (1, 800, 800, 1)
