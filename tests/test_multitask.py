"""Joint multi-task model: shared-encoder consistency + mesh training."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"

import jax
import jax.numpy as jnp

from driving_dirty_tpu.models.multitask import MultiTask

TINY = dict(
    batch_size=2, learning_rate=1e-3, pretrained_path=None,
    ae_hidden_dim=8, ae_latent_dim=8, max_bb=8,
)


def _batch(b=2):
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, 8, 2, 4), np.float32)
    valid = np.zeros((b, 8), bool)
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    valid[:, 0] = True
    return {
        "images": jnp.asarray(rng.rand(b, 6, 256, 306, 3).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
        "categories": jnp.zeros((b, 8), jnp.int32),
        "road": jnp.asarray((rng.rand(b, 800, 800) > 0.5).astype(np.float32)),
    }


def test_multitask_loss_and_metrics():
    task = MultiTask(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch()
    loss, (ns, metrics) = task.loss(params, state, batch, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))
    assert {"rm_loss", "box_loss"} <= set(metrics)
    m = task.val_metrics(params, state, batch, jax.random.PRNGKey(1))
    assert 0.0 <= float(m["val_rm_ts_rounded"]) <= 1.0
    assert 0.0 <= float(m["val_ts_boxes"]) <= 1.0


def test_multitask_shared_encoder_matches_separate_paths():
    # the fused forward must equal running the encoder twice (latent + c3 tap)
    task = MultiTask(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _batch(1)
    rng = jax.random.PRNGKey(2)
    rm_logits, box_probs, _ = task.forward(params, state, batch["images"], train=False, rng=rng)

    from driving_dirty_tpu.ops.stitch import wide_stitch

    pano = wide_stitch(batch["images"])
    z, _ = task.ae.encoder.apply(params["encoder"], state["encoder"], pano, train=False, rng=rng)
    ref_logits = task.rm_head.apply(params["rm_head"], z).reshape(1, 800, 800)
    np.testing.assert_allclose(np.asarray(rm_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)

    ssr, _ = task.ae.encoder.apply(params["encoder"], state["encoder"], pano, train=False, rng=rng, c3_only=True)
    spatial, _ = task.space_map_cnn.apply(params["space_map_cnn"], {}, batch["images"])
    ref_probs, _ = task.box_merge.apply(params["box_merge"], {}, ssr, spatial)
    np.testing.assert_allclose(np.asarray(box_probs), np.asarray(ref_probs[..., 0]), rtol=1e-5, atol=1e-5)


def test_multitask_trains_on_8device_mesh():
    from driving_dirty_tpu.parallel import mesh as mesh_lib
    from driving_dirty_tpu.train.trainer import Trainer

    class InMemLoader:
        def __init__(self, batch):
            self.batch = batch

        def __iter__(self):
            import numpy as _np

            b = self.batch["images"].shape[0]
            yield jax.tree.map(lambda x: _np.asarray(x), self.batch), _np.ones(b, bool)

    mesh = mesh_lib.build_mesh(8, 2)  # dp=4 x tp=2: the v5e-8 layout
    task = MultiTask({**TINY, "batch_size": 4})
    batch = _batch(4)  # one scene per data-parallel row keeps CPU cost sane
    task.train_loader = lambda: InMemLoader(batch)
    task.val_loader = lambda: InMemLoader(batch)
    trainer = Trainer(max_epochs=1, default_root_dir="/tmp/dd_mt_logs", mesh=mesh,
                      enable_progress_bar=False, enable_checkpointing=False)
    result = trainer.fit(task)
    assert np.isfinite(result.best_val_loss)
