"""Spatial BB + coordinate-regression MLP tasks and the submit registry."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"

import jax
import jax.numpy as jnp

from driving_dirty_tpu.data.synthetic import generate
from driving_dirty_tpu.models.bb_mlp import Boxes
from driving_dirty_tpu.models.spatial_bb import BBSpatialModel, BBSpatialRoadMap
from driving_dirty_tpu.train.trainer import Trainer

TINY = dict(
    batch_size=2, learning_rate=1e-3, samples_per_scene=4, num_labeled_scenes=3,
    ae_hidden_dim=8, ae_latent_dim=8, pretrained_path=None, max_bb=16,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dd_data")
    generate(str(d), scenes=1, samples=4, labeled_scenes=3, seed=0)
    return str(d)


def _fake_batch(task, b=2, max_bb=16):
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, max_bb, 2, 4), np.float32)
    valid = np.zeros((b, max_bb), bool)
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    valid[:, 0] = True
    return {
        "images": jnp.asarray(rng.rand(b, 6, 256, 306, 3).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
        "categories": jnp.zeros((b, max_bb), jnp.int32),
        "road": jnp.asarray((rng.rand(b, 800, 800) > 0.5).astype(np.float32)),
    }


@pytest.mark.parametrize("cls", [BBSpatialModel, BBSpatialRoadMap])
def test_spatial_models_loss_and_grads(cls):
    task = cls(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _fake_batch(task)
    loss, (new_state, _) = task.loss(params, state, batch, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))
    # occupancy prediction is a proper probability map
    road = batch["road"] if cls.uses_roadmap else None
    probs, _ = task.forward(params, state, batch["images"], road, train=False, rng=jax.random.PRNGKey(2))
    assert probs.shape == (2, 800, 800)
    p = np.asarray(probs)
    assert p.min() >= 0 and p.max() <= 1


def test_spatial_mse_loss_flag():
    task = BBSpatialModel({**TINY, "mse_loss": True})
    params, state = task.init(jax.random.PRNGKey(0))
    loss, _ = task.loss(params, state, _fake_batch(task), jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))


def test_bb_mlp_shapes_and_loss():
    task = Boxes(TINY)
    params, state = task.init(jax.random.PRNGKey(0))
    batch = _fake_batch(task)
    pred, _ = task.forward(params, state, batch["images"], train=False, rng=jax.random.PRNGKey(1))
    assert pred.shape == (2, 16, 2, 4)
    loss, _ = task.loss(params, state, batch, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))


def test_spatial_rm_trains_end_to_end(data_dir, tmp_path):
    task = BBSpatialRoadMap(dict(link=data_dir, **TINY))
    trainer = Trainer(max_epochs=1, default_root_dir=str(tmp_path / "logs"),
                      limit_train_batches=1, limit_val_batches=1,
                      enable_progress_bar=False)
    result = trainer.fit(task)
    assert np.isfinite(result.best_val_loss)


def test_submit_registry_and_grid():
    from driving_dirty_tpu.cli.submit import _registry, grid_trials

    reg = _registry()
    for name in ("basic_ae", "roadmap_mse", "roadmap_bce", "spatial_rm", "bb_mlp"):
        assert name in reg
    trials = grid_trials("basic_ae", 12)
    assert len(trials) == 6  # 2 latent x 3 lr
    assert all("latent_dim" in t for t in trials)
    assert grid_trials("basic_ae", 2) == trials[:2]
    # grids are declared by the models (opt_list/tune), not a central table
    assert grid_trials("roadmap_bce", 12) == [
        {"unfreeze_epoch_no": 0}, {"unfreeze_epoch_no": 20}]
    assert grid_trials("roadmap_mse", 12) == [
        {"learning_rate": lr} for lr in (1e-3, 1e-4, 1e-5)]
    assert len(grid_trials("faster_rcnn_rm", 12)) == 6  # 3 lr x 2 unfreeze
    assert len(grid_trials("multitask", 12)) == 6  # 2 lr x 3 box_loss_weight
    assert grid_trials("roadmap_bce_v1", 12) == [{}]  # v1 has no tunables


def test_submit_emit_commands(capsys):
    from driving_dirty_tpu.cli import submit

    submit.main(["--model", "roadmap_bce", "--emit_commands", "--tt_name", "x"])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("python")]
    assert len(lines) == 2  # unfreeze grid
    assert "--single_run" in lines[0]


def test_spatial_val_metrics_include_box_ts():
    # val reports the occupancy threat score of the thresholded prediction
    # vs the rasterized GT target (device-side)
    import jax
    import numpy as np

    from driving_dirty_tpu.models.spatial_bb import BBSpatialModel

    task = BBSpatialModel(dict(
        batch_size=1, pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
        max_bb=8,
    ))
    params, state = task.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    boxes = np.zeros((1, 8, 2, 4), np.float32)
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    valid = np.zeros((1, 8), bool)
    valid[:, 0] = True
    batch = {
        "images": rng.rand(1, 6, 256, 306, 3).astype(np.float32),
        "boxes": boxes,
        "box_valid": valid,
        "road": (rng.rand(1, 800, 800) > 0.5).astype(np.float32),
    }
    m = task.val_metrics(params, state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["val_loss"]))
    assert 0.0 <= float(m["val_ts_boxes"]) <= 1.0
