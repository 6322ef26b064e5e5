"""Torch Lightning checkpoint import: reference module naming -> framework
pytrees, verified by output equality against the torch model."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from driving_dirty_tpu.checkpoints import torch_import  # noqa: E402
from driving_dirty_tpu.nn.autoencoder import Decoder, Encoder  # noqa: E402

KEY = jax.random.PRNGKey(0)


class TDense(torch.nn.Module):
    # DenseBlock module naming per components.py:96-109: fc1 + fc_bn
    def __init__(self, i, o):
        super().__init__()
        self.fc1 = torch.nn.Linear(i, o)
        self.fc_bn = torch.nn.BatchNorm1d(o)

    def forward(self, x):
        return TF.relu(self.fc_bn(self.fc1(x)))


class TEnc(torch.nn.Module):
    # Encoder naming per components.py:19-29
    def __init__(self, hidden, latent, h, w):
        super().__init__()
        self.c1 = torch.nn.Conv2d(3, 32, 3, padding=1)
        self.c2 = torch.nn.Conv2d(32, 32, 3, padding=1)
        self.c3 = torch.nn.Conv2d(32, 32, 3, stride=2, padding=1)
        cod = 32 * ((h + 1) // 2) * ((w + 1) // 2) // 4
        self.fc1 = TDense(cod, hidden)
        self.fc2 = TDense(hidden, hidden)
        self.fc_z_out = torch.nn.Linear(hidden, latent)

    def forward(self, x):
        x = TF.relu(self.c1(x))
        x = TF.relu(self.c2(x))
        x = TF.relu(self.c3(x))
        x = x.reshape(x.size(0), -1).unsqueeze(1)
        x = TF.max_pool1d(x, 4).squeeze(1)
        return self.fc_z_out(self.fc2(self.fc1(x)))


class TDec(torch.nn.Module):
    # Decoder naming per components.py:68-73
    def __init__(self, hidden, latent, oh, ow):
        super().__init__()
        self.h, self.w = oh // 2, ow // 2
        self.fc1 = TDense(latent, hidden)
        self.fc2 = TDense(hidden, self.h * self.w * 64)
        self.dc1 = torch.nn.ConvTranspose2d(64, 32, 3, padding=1)
        self.dc2 = torch.nn.ConvTranspose2d(32, 32, 3, padding=1)
        self.dc3 = torch.nn.ConvTranspose2d(32, 32, 2, stride=2)
        self.dc4 = torch.nn.ConvTranspose2d(32, 3, 1, stride=1)

    def forward(self, z):
        x = self.fc2(self.fc1(z))
        x = x.view(x.size(0), 64, self.h, self.w)
        x = TF.relu(self.dc1(x))
        x = TF.relu(self.dc2(x))
        x = TF.relu(self.dc3(x))
        return self.dc4(x)


class TAE(torch.nn.Module):
    def __init__(self, hidden=8, latent=6, h=64, w=96, oh=32, ow=40):
        super().__init__()
        self.encoder = TEnc(hidden, latent, h, w)
        self.decoder = TDec(hidden, latent, oh, ow)


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    ae = TAE().eval()
    path = tmp_path_factory.mktemp("ck") / "ae.ckpt"
    torch.save(
        {"state_dict": ae.state_dict(),
         "hparams": {"hidden_dim": 8, "latent_dim": 6, "input_height": 64,
                      "input_width": 96, "output_height": 32, "output_width": 40}},
        str(path),
    )
    return str(path), ae


def test_import_basic_ae_encoder_output_parity(torch_ckpt):
    path, ae = torch_ckpt
    params, state, hparams = torch_import.import_basic_ae(path)
    assert hparams["latent_dim"] == 6
    enc = Encoder(8, 6, 3, 64, 96)
    x = np.random.RandomState(0).randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = ae.encoder(torch.from_numpy(x)).numpy()
    got, _ = enc.apply(
        jax.tree.map(jnp.asarray, params["encoder"]),
        jax.tree.map(jnp.asarray, state["encoder"]),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False, rng=KEY,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_import_basic_ae_decoder_output_parity(torch_ckpt):
    path, ae = torch_ckpt
    params, state, _ = torch_import.import_basic_ae(path)
    dec = Decoder(8, 6, 3, 32, 40)
    z = np.random.RandomState(1).randn(2, 6).astype(np.float32)
    with torch.no_grad():
        ref = ae.decoder(torch.from_numpy(z)).numpy()
    got, _ = dec.apply(
        jax.tree.map(jnp.asarray, params["decoder"]),
        jax.tree.map(jnp.asarray, state["decoder"]),
        jnp.asarray(z), train=False, rng=KEY,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4
    )


def test_convert_roadmap_ckpt_roundtrip(tmp_path):
    # roadmap ckpt: ae.encoder backbone + fc1 head (roadmap_bce_v2.py:43,50)
    torch.manual_seed(1)

    class TRM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ae = TAE(hidden=8, latent=6, h=64, w=96)
            self.fc1 = torch.nn.Linear(6, 800 * 800)

    rm = TRM().eval()
    tpath = tmp_path / "rm.ckpt"
    torch.save({"state_dict": rm.state_dict(), "hparams": {"batch_size": 4}}, str(tpath))
    out = torch_import.convert_roadmap_ckpt(str(tpath), str(tmp_path / "rm_jax.ckpt"))

    from driving_dirty_tpu.checkpoints import io as ckpt_io

    blob = ckpt_io.load(out)
    assert blob["hparams"]["ae_latent_dim"] == 6
    assert blob["hparams"]["ae_hidden_dim"] == 8
    assert blob["params"]["fc1"]["w"].shape == (6, 640000)
    assert blob["state"]["encoder"]["fc1"]["bn"]["mean"].shape == (8,)


def test_run_test_autodetects_torch_ckpt(tmp_path):
    """cli.run_test accepts the reference's raw Lightning rm.ckpt directly
    (/root/reference/README.md:33-37): load_roadmap_model falls back to the
    torch importer when the file is not a framework npz."""
    torch.manual_seed(2)

    class TRM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ae = TAE(hidden=8, latent=6, h=64, w=96)
            self.fc1 = torch.nn.Linear(6, 800 * 800)

    rm = TRM().eval()
    tpath = tmp_path / "rm.ckpt"
    torch.save(
        {"state_dict": rm.state_dict(),
         # scalars are carried into the rebuilt task's hparams; the tiny AE
         # dims must override the full-size defaults
         "hparams": {"batch_size": 2, "ae_input_height": 64,
                      "ae_input_width": 96}},
        str(tpath),
    )

    from driving_dirty_tpu.cli.run_test import load_roadmap_model

    task, params, state = load_roadmap_model(str(tpath))
    assert params["fc1"]["w"].shape == (6, 640000)
    # one jitted forward at the imported dims: 6 views of 64x16 -> 96 wide
    images = jnp.asarray(np.random.rand(1, 6, 64, 16, 3).astype(np.float32))
    logits, prob, _ = jax.jit(
        lambda p, s, x: task.forward(p, s, x, train=False,
                                     rng=jax.random.PRNGKey(0))
    )(params, state, images)
    assert prob.shape == (1, 800, 800)
    assert np.isfinite(np.asarray(logits)).all()
