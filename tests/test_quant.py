"""int8 quantized trunk (ops/quant.py): error bounds + end-to-end mask parity."""
import jax
import jax.numpy as jnp
import numpy as np

import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"

from driving_dirty_tpu.ops.quant import (
    absmax_scale,
    conv2d_int8,
    encoder_convs_int8,
    quantize,
    quantize_conv_weight,
)


def _f32_trunk(params, x):
    from driving_dirty_tpu.pallas.trunk import xla_trunk

    return xla_trunk(
        x,
        params["c1"]["w"], params["c1"]["b"],
        params["c2"]["w"], params["c2"]["b"],
        params["c3"]["w"], params["c3"]["b"],
    )


def _rand_params(rng):
    def conv(ci, co):
        return {
            "w": jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.15),
            "b": jnp.asarray(rng.randn(co).astype(np.float32) * 0.1),
        }

    return {"c1": conv(3, 32), "c2": conv(32, 32), "c3": conv(32, 32)}


def test_int8_conv_matches_float_within_quant_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 32).astype(np.float32) * 0.2)
    wq, w_inv = quantize_conv_weight(w)
    s = absmax_scale(x)
    y = conv2d_int8(quantize(x, s), wq, 1.0 / s, w_inv)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = np.abs(np.asarray(y) - np.asarray(ref))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-6)
    assert rel < 0.02, rel


def test_int8_trunk_relative_error_small():
    rng = np.random.RandomState(1)
    params = _rand_params(rng)
    x = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    ref = np.asarray(_f32_trunk(params, x))
    out = np.asarray(encoder_convs_int8(params, x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.05, rel


def test_int8_resident_matches_shipped():
    """The hand-fused int8-resident probe variant (negative perf result, kept
    in-tree) must stay numerically identical to the shipped static-scale
    path: same quantized values at every junction, f32 epilogue math."""
    from driving_dirty_tpu.ops.quant import calibrate_trunk, encoder_convs_int8_resident

    rng = np.random.RandomState(2)
    params = _rand_params(rng)
    x = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    scales = calibrate_trunk(params, x)
    a = np.asarray(encoder_convs_int8(params, x, scales=scales))
    b = np.asarray(encoder_convs_int8_resident(params, x, scales))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_precision8_roadmap_mask_agreement():
    """End-to-end: --precision 8 masks agree with bf16 masks nearly everywhere
    (the 800x800 output is thresholded, so only boundary pixels may flip)."""
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    base = dict(pretrained_path=None, ae_hidden_dim=16, ae_latent_dim=8,
                ae_input_height=16, ae_input_width=24 * 6, batch_size=2)
    t16 = RoadMapBCEv2({**base, "precision": 16})
    t8 = RoadMapBCEv2({**base, "precision": 8})
    params, state = t16.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(2).rand(2, 6, 16, 24, 3).astype(np.float32))
    m16 = np.asarray(t16.predict(params, state, x))
    m8 = np.asarray(t8.predict(params, state, x))
    agreement = (m16 == m8).mean()
    assert agreement > 0.99, agreement


def test_precision8_training_stays_float():
    """int8 applies at inference only; the training path must remain
    differentiable (grads flow through the float trunk)."""
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    t8 = RoadMapBCEv2(dict(pretrained_path=None, ae_hidden_dim=16,
                           ae_latent_dim=8, ae_input_height=16,
                           ae_input_width=24 * 6, precision=8, batch_size=2))
    params, state = t8.init(jax.random.PRNGKey(0))
    batch = {
        "images": jnp.asarray(np.random.RandomState(3).rand(2, 6, 16, 24, 3).astype(np.float32)),
        "road": jnp.asarray((np.random.RandomState(4).rand(2, 800, 800) > 0.5).astype(np.float32)),
    }

    def loss_fn(p):
        loss, _ = t8.loss(p, state, batch, jax.random.PRNGKey(1), train=True)
        return loss

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_uint8_pipeline_matches_float():
    """uint8 loader items + on-device /255 == host-side float32 /255."""
    from driving_dirty_tpu.ops.stitch import normalize_images

    raw = np.random.RandomState(5).randint(0, 256, (2, 6, 8, 12, 3), np.uint8)
    f32 = raw.astype(np.float32) / 255.0
    out = np.asarray(normalize_images(jnp.asarray(raw)))
    np.testing.assert_allclose(out, f32, atol=1e-7)
    # float inputs pass through unchanged
    same = np.asarray(normalize_images(jnp.asarray(f32)))
    np.testing.assert_allclose(same, f32)


def test_dataset_raw_uint8(tmp_path):
    from driving_dirty_tpu.data.synthetic import generate

    generate(str(tmp_path), scenes=1, samples=2, labeled_scenes=1)
    from driving_dirty_tpu.data.dataset import LabeledDataset, UnlabeledDataset

    ds8 = UnlabeledDataset(str(tmp_path), [0], "sample", samples_per_scene=2,
                           raw_uint8=True)
    dsf = UnlabeledDataset(str(tmp_path), [0], "sample", samples_per_scene=2)
    a, b = ds8[0], dsf[0]
    assert a.dtype == np.uint8 and b.dtype == np.float32
    np.testing.assert_allclose(a.astype(np.float32) / 255.0, b, atol=1e-6)

    lab8 = LabeledDataset(str(tmp_path), f"{tmp_path}/annotation.csv", [106],
                          samples_per_scene=2, raw_uint8=True)[0]
    assert lab8["images"].dtype == np.uint8
    assert lab8["road"].dtype == np.float32  # labels keep the float path
