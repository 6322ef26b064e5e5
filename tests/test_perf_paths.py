"""Equivalence tests for the performance-motivated code paths added after the
initial build: chunked detection predict, exact/approx proposal top-k,
encoder remat, and the adaptive loader defaults. Each fast path must be
behavior-identical (or explicitly bounded) vs its reference path.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"


def _tiny_rcnn(**over):
    from driving_dirty_tpu.models.faster_rcnn import BBFasterRCNN

    hp = dict(pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
              image_size=64, rpn_pre_nms_top_n=64, rpn_post_nms_top_n=32,
              box_batch_per_image=16, batch_size=4, exact_topk=1)
    hp.update(over)
    return BBFasterRCNN(hp)


def test_chunked_predict_matches_unchunked():
    task = _tiny_rcnn()
    task.predict_chunk = 2
    params, state = task.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 6, 256, 306, 3).astype(np.float32))
    chunked = task.predict(params, state, x)
    task.predict_chunk = 8  # 4 <= 8 -> single unchunked call
    whole = task.predict(params, state, x)
    for k in chunked:
        np.testing.assert_allclose(
            np.asarray(chunked[k], np.float32), np.asarray(whole[k], np.float32),
            atol=1e-5, rtol=1e-5)


def test_exact_topk_flag_plumbs_to_config():
    assert _tiny_rcnn(exact_topk=1).cfg.exact_topk is True
    assert _tiny_rcnn(exact_topk=0).cfg.exact_topk is False


def test_remat_flag_does_not_change_loss():
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    base = dict(pretrained_path=None, ae_hidden_dim=16, ae_latent_dim=8,
                ae_input_height=16, ae_input_width=24 * 6, batch_size=2)
    rng = np.random.RandomState(1)
    batch = {
        "images": jnp.asarray(rng.rand(2, 6, 16, 24, 3).astype(np.float32)),
        "road": jnp.asarray((rng.rand(2, 800, 800) > 0.5).astype(np.float32)),
    }
    losses = {}
    for remat in (True, False):
        t = RoadMapBCEv2({**base, "remat": remat})
        params, state = t.init(jax.random.PRNGKey(0))
        loss, _ = t.loss(params, state, batch, jax.random.PRNGKey(2), train=True)
        losses[remat] = float(loss)
    assert abs(losses[True] - losses[False]) < 1e-6, losses


def test_num_workers_flag_and_adaptive_default():
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    ns = argparse.Namespace(pretrained_path=None, ae_hidden_dim=8,
                            ae_latent_dim=8, num_workers=None)
    t = RoadMapBCEv2(ns)
    assert t._num_workers() >= 4
    ns.num_workers = 7
    assert RoadMapBCEv2(ns)._num_workers() == 7


def test_uint8_and_float_pipeline_same_loss(tmp_path):
    """Task-level: loss computed from uint8 loader items equals the float
    pipeline's loss (device-side /255 vs host-side)."""
    from driving_dirty_tpu.data.synthetic import generate
    from driving_dirty_tpu.models.basic_ae import BasicAE

    generate(str(tmp_path), scenes=1, samples=4, labeled_scenes=1)
    losses = {}
    for u8 in (1, 0):
        t = BasicAE(dict(link=str(tmp_path), hidden_dim=8, latent_dim=8,
                         batch_size=2, num_unlabeled_scenes=1,
                         samples_per_scene=4, uint8_pipeline=u8,
                         num_workers=2))
        params, state = t.init(jax.random.PRNGKey(0))
        batch, _ = next(iter(t.train_loader()))
        expect = np.uint8 if u8 else np.float32
        assert batch.dtype == expect, (u8, batch.dtype)
        loss, _ = t.loss(params, state, {"images": jnp.asarray(batch)},
                         jax.random.PRNGKey(1), train=False)
        losses[u8] = float(loss)
    assert abs(losses[1] - losses[0]) < 1e-6, losses
