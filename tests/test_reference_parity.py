"""Parity oracles sourced from the ACTUAL reference code (VERDICT r3 item 2).

Earlier parity tests hand-rebuilt the torch modules from the documented
architecture; a shared misreading of the reference would pass silently. These
tests import the genuine modules —
  /root/reference/src/autoencoder/components.py            (Encoder/Decoder/DenseBlock)
  /root/reference/src/bounding_box_model/spatial_bb/components.py
                               (SpatialMappingCNN, *MergingCNN)
— by file path (they import only torch), copy their weights into our pytrees,
and compare outputs. The hand-rebuilt tests remain as secondary coverage.

Reference quirk pinned here: DenseBlock.forward calls F.dropout(x, p) without
`training=self.training`, so the GENUINE reference applies dropout even in
eval mode (components.py:104-109). Our framework deliberately implements
deterministic eval; for output comparison we zero drop_p at runtime (config,
not code) and document the divergence with its own test.
"""
import importlib.util
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # torch forwards at real sizes: fast tier skips

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from driving_dirty_tpu.checkpoints import torch_import  # noqa: E402
from driving_dirty_tpu.nn.autoencoder import Decoder, Encoder  # noqa: E402
from driving_dirty_tpu.nn import spatial as our_spatial  # noqa: E402

REF = "/root/reference"
REF_AE = os.path.join(REF, "src/autoencoder/components.py")
REF_SP = os.path.join(REF, "src/bounding_box_model/spatial_bb/components.py")

pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(not os.path.exists(REF_AE), reason="reference tree absent"),
]

KEY = jax.random.PRNGKey(0)


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_ae():
    return _load_ref("ref_ae_components", REF_AE)


@pytest.fixture(scope="module")
def ref_sp():
    return _load_ref("ref_sp_components", REF_SP)


def _np_sd(module, prefix=""):
    pre = f"{prefix}." if prefix else ""
    return {f"{pre}{k}": v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _zero_dropout(module):
    """Deterministic comparison: the genuine DenseBlock drops even in eval."""
    for m in module.modules():
        if hasattr(m, "drop_p"):
            m.drop_p = 0.0


def _j(params):
    return jax.tree.map(jnp.asarray, params)


# --- the dropout-in-eval quirk, pinned as behavior ------------------------


def test_genuine_dense_block_applies_dropout_in_eval(ref_ae):
    torch.manual_seed(0)
    blk = ref_ae.DenseBlock(16, 16).eval()
    x = torch.randn(4, 16)
    with torch.no_grad():
        a, b = blk(x), blk(x)
    assert not torch.equal(a, b), (
        "reference DenseBlock is expected to be stochastic in eval "
        "(F.dropout without training=self.training, components.py:104-109); "
        "our framework's deterministic eval is a deliberate divergence"
    )


# --- genuine Encoder / Decoder parity -------------------------------------


@pytest.fixture(scope="module")
def genuine_encoder(ref_ae):
    torch.manual_seed(3)
    enc = ref_ae.Encoder(8, 6, 3, 64, 96).eval()
    _zero_dropout(enc)
    return enc


def test_genuine_encoder_full_path_parity(genuine_encoder):
    enc_t = genuine_encoder
    params, state = torch_import.import_encoder(_np_sd(enc_t, "encoder"), "encoder")
    ours = Encoder(8, 6, 3, 64, 96)
    x = np.random.RandomState(0).randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = enc_t(torch.from_numpy(x)).numpy()
    got, _ = ours.apply(_j(params), _j(state),
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        train=False, rng=KEY)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_genuine_encoder_c3_only_parity(genuine_encoder):
    enc_t = genuine_encoder
    params, state = torch_import.import_encoder(_np_sd(enc_t, "encoder"), "encoder")
    ours = Encoder(8, 6, 3, 64, 96)
    x = np.random.RandomState(1).randn(2, 3, 64, 96).astype(np.float32)
    enc_t.c3_only = True  # attribute flag, as spatial_w_rm.py:47 sets it
    try:
        with torch.no_grad():
            ref = enc_t(torch.from_numpy(x)).numpy()  # [b, 32, 32, 48] NCHW
    finally:
        enc_t.c3_only = False
    got, _ = ours.apply(_j(params), _j(state),
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        train=False, rng=KEY, c3_only=True)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4
    )


def test_genuine_encoder_derived_dims_at_reference_size(ref_ae):
    """The init-time shape inference (jax.eval_shape vs the reference's
    torch.rand dummy forward, components.py:33-38) must agree at the REAL
    input size: 3x256x1836 -> conv_out_dim 940032 (SURVEY.md hard-part 5).
    Constructing the genuine Encoder at full size is cheap (one dummy fwd)."""
    torch.manual_seed(0)
    enc = ref_ae.Encoder(8, 6, 3, 256, 1836)
    ref_dim = enc.fc1.fc1.in_features
    assert ref_dim == 940032
    ours = Encoder(8, 6, 3, 256, 1836)
    assert ours.conv_out_dim() == ref_dim


def test_genuine_decoder_parity(ref_ae):
    torch.manual_seed(4)
    dec_t = ref_ae.Decoder(8, 6, 3, 32, 40).eval()
    _zero_dropout(dec_t)
    params, state = torch_import.import_decoder(_np_sd(dec_t, "decoder"), "decoder")
    ours = Decoder(8, 6, 3, 32, 40)
    z = np.random.RandomState(2).randn(2, 6).astype(np.float32)
    with torch.no_grad():
        ref = dec_t(torch.from_numpy(z)).numpy()
    got, _ = ours.apply(_j(params), _j(state), jnp.asarray(z), train=False, rng=KEY)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4
    )


# --- genuine spatial components parity ------------------------------------


def _conv_p(sd, name):
    return torch_import._conv(sd, name)


def _convT_p(sd, name):
    return torch_import._convT(sd, name)


def test_genuine_spatial_mapping_parity(ref_sp):
    torch.manual_seed(5)
    t = ref_sp.SpatialMappingCNN().eval()
    sd = _np_sd(t)
    params = {n: _conv_p(sd, n) for n in
              ("fl_conv", "fr_conv", "bl_conv", "br_conv", "f_conv", "b_conv", "out_conv")}
    x = np.random.RandomState(3).rand(2, 6, 3, 256, 306).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()  # [2, 32, 256, 256]
    got, _ = our_spatial.SpatialMappingCNN().apply(
        _j(params), {}, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4
    )


def test_genuine_boxes_merging_parity(ref_sp):
    torch.manual_seed(6)
    t = ref_sp.BoxesMergingCNN().eval()
    sd = _np_sd(t)
    params = {
        "ss_conv": _conv_p(sd, "ss_conv"),
        "ss_deconv": _convT_p(sd, "ss_deconv"),
        **{f"up_conv_{i}": _convT_p(sd, f"up_conv_{i}") for i in (1, 2, 3, 4)},
    }
    rng = np.random.RandomState(4)
    ssr = rng.rand(1, 32, 128, 918).astype(np.float32)
    sp = rng.rand(1, 32, 256, 256).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(ssr), torch.from_numpy(sp)).numpy()  # [1,1,800,800]
    got, _ = our_spatial.BoxesMergingCNN().apply(
        _j(params), {},
        jnp.asarray(np.transpose(ssr, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(sp, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4
    )


def test_genuine_roadmap_boxes_merging_parity(ref_sp):
    torch.manual_seed(7)
    t = ref_sp.RoadMapBoxesMergingCNN().eval()
    sd = _np_sd(t)
    params = {
        "ss_conv": _conv_p(sd, "ss_conv"),
        "ss_deconv": _convT_p(sd, "ss_deconv"),
        "rm_conv_1": _conv_p(sd, "rm_conv_1"),
        "rm_conv_2": _conv_p(sd, "rm_conv_2"),
        **{f"up_conv_{i}": _convT_p(sd, f"up_conv_{i}") for i in (1, 2, 3, 4, 5)},
    }
    rng = np.random.RandomState(5)
    ssr = rng.rand(1, 32, 128, 918).astype(np.float32)
    sp = rng.rand(1, 32, 256, 256).astype(np.float32)
    rm = rng.rand(1, 1, 800, 800).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(ssr), torch.from_numpy(sp), torch.from_numpy(rm)).numpy()
    got, _ = our_spatial.RoadMapBoxesMergingCNN().apply(
        _j(params), {},
        jnp.asarray(np.transpose(ssr, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(sp, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(rm, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4
    )


# --- Lightning-format roadmap ckpt built from the GENUINE module tree ------


def test_genuine_roadmap_ckpt_roundtrip_run_test(ref_ae, tmp_path):
    """A Lightning-style rm.ckpt whose state_dict comes from the reference's
    OWN module tree (ae.encoder.* naming per roadmap_bce_v2.py:43,50) must
    round-trip through checkpoints.torch_import -> cli.run_test and produce
    the same roadmap probabilities as the torch forward."""
    torch.manual_seed(8)

    class RefRoadMap(torch.nn.Module):
        # the reference holds a full BasicAE and uses ae.encoder + fc1
        def __init__(self):
            super().__init__()

            class AE(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.encoder = ref_ae.Encoder(8, 6, 3, 64, 96)
                    self.decoder = ref_ae.Decoder(8, 6, 3, 32, 40)

            self.ae = AE()
            self.fc1 = torch.nn.Linear(6, 800 * 800)

    rm = RefRoadMap().eval()
    _zero_dropout(rm)
    tpath = tmp_path / "rm.ckpt"
    torch.save(
        {"state_dict": rm.state_dict(),
         "hyper_parameters": {"batch_size": 2, "ae_input_height": 64,
                              "ae_input_width": 96}},
        str(tpath),
    )

    from driving_dirty_tpu.cli.run_test import load_roadmap_model

    task, params, state = load_roadmap_model(str(tpath))
    # six 64x16 views -> 64x96 wide panorama
    views = np.random.RandomState(6).rand(1, 6, 64, 16, 3).astype(np.float32)
    _, prob, _ = jax.jit(
        lambda p, s, x: task.forward(p, s, x, train=False, rng=KEY)
    )(params, state, jnp.asarray(views))

    # torch forward replicating the reference: stitch [0,1,2,5,4,3] -> wide,
    # encoder, fc1, reshape, sigmoid (roadmap_bce_v2.py:53-81)
    wide = np.concatenate([views[:, i] for i in (0, 1, 2, 5, 4, 3)], axis=2)
    xt = torch.from_numpy(np.ascontiguousarray(np.transpose(wide, (0, 3, 1, 2))))
    with torch.no_grad():
        z = rm.ae.encoder(xt)
        ref = torch.sigmoid(rm.fc1(z).view(1, 800, 800)).numpy()
    np.testing.assert_allclose(np.asarray(prob), ref, rtol=1e-3, atol=1e-4)
