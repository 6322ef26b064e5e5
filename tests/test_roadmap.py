"""Roadmap fine-tune pipeline: pretrained AE ckpt -> roadmap training ->
run_test inference (the minimum end-to-end slice of SURVEY.md §7)."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"

import jax
import jax.numpy as jnp

from driving_dirty_tpu.data.synthetic import generate
from driving_dirty_tpu.models.basic_ae import BasicAE
from driving_dirty_tpu.models.roadmap import RoadMap, RoadMapBCEv2
from driving_dirty_tpu.train.trainer import Trainer

TINY_AE = dict(
    hidden_dim=8, latent_dim=8, batch_size=2, learning_rate=1e-3,
    samples_per_scene=4, num_unlabeled_scenes=3,
)
TINY_RM = dict(
    batch_size=2, learning_rate=1e-3, samples_per_scene=4, num_labeled_scenes=3,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dd_data")
    generate(str(d), scenes=3, samples=4, labeled_scenes=3, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def ae_ckpt(data_dir, tmp_path_factory):
    logs = tmp_path_factory.mktemp("ae_logs")
    trainer = Trainer(max_epochs=1, default_root_dir=str(logs),
                      limit_train_batches=1, limit_val_batches=1,
                      enable_progress_bar=False)
    result = trainer.fit(BasicAE(dict(link=data_dir, **TINY_AE)))
    return result.last_ckpt_path


def test_roadmap_bce_trains_from_pretrained(data_dir, ae_ckpt, tmp_path):
    task = RoadMapBCEv2(dict(link=data_dir, pretrained_path=ae_ckpt,
                             unfreeze_epoch_no=1, **TINY_RM))
    assert task.latent_dim == 8  # hparams came from the AE checkpoint
    trainer = Trainer(max_epochs=2, default_root_dir=str(tmp_path / "logs"),
                      limit_train_batches=2, limit_val_batches=1,
                      enable_progress_bar=False)
    result = trainer.fit(task)
    assert np.isfinite(result.best_val_loss)
    assert result.best_ckpt_path


def test_roadmap_frozen_encoder_params_unchanged(data_dir, ae_ckpt, tmp_path):
    task = RoadMapBCEv2(dict(link=data_dir, pretrained_path=ae_ckpt,
                             unfreeze_epoch_no=100, **TINY_RM))
    params0, _ = task.init(jax.random.PRNGKey(0))
    enc0 = jax.tree.map(np.asarray, params0["encoder"])
    trainer = Trainer(max_epochs=1, default_root_dir=str(tmp_path / "logs"),
                      limit_train_batches=2, limit_val_batches=0,
                      enable_progress_bar=False)
    result = trainer.fit(task)
    enc1 = jax.tree.map(np.asarray, result.params["encoder"])
    for a, b in zip(jax.tree.leaves(enc0), jax.tree.leaves(enc1)):
        np.testing.assert_array_equal(a, b)  # frozen encoder untouched
    # ... while the head moved
    assert not np.allclose(
        np.asarray(params0["fc1"]["w"]), np.asarray(result.params["fc1"]["w"])
    )


def test_roadmap_unfreeze_boundary_updates_encoder(data_dir, ae_ckpt, tmp_path):
    """Crossing --unfreeze_epoch_no must switch to the unfrozen compiled step
    (trainer builds one program per freeze stage): after the boundary the
    encoder params MOVE, while the frozen epoch left them bit-identical."""
    task = RoadMapBCEv2(dict(link=data_dir, pretrained_path=ae_ckpt,
                             unfreeze_epoch_no=1, **TINY_RM))
    params0, _ = task.init(jax.random.PRNGKey(0))
    enc0 = jax.tree.map(np.asarray, params0["encoder"])
    trainer = Trainer(max_epochs=2, default_root_dir=str(tmp_path / "logs"),
                      limit_train_batches=2, limit_val_batches=0,
                      enable_progress_bar=False)
    result = trainer.fit(task)
    enc1 = jax.tree.leaves(jax.tree.map(np.asarray, result.params["encoder"]))
    moved = any(not np.array_equal(a, b)
                for a, b in zip(jax.tree.leaves(enc0), enc1))
    assert moved  # epoch 1 ran the unfrozen program and updated the encoder


def test_roadmap_mse_variant_loss(data_dir, ae_ckpt):
    task = RoadMap(dict(link=data_dir, pretrained_path=ae_ckpt, **TINY_RM))
    params, state = task.init(jax.random.PRNGKey(0))
    batch = {
        "images": jnp.zeros((2, 6, 256, 306, 3)),
        "road": jnp.ones((2, 800, 800)) * 0.5,
    }
    loss, (new_state, _) = task.loss(params, state, batch, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))
    m = task.val_metrics(params, state, batch, jax.random.PRNGKey(1))
    assert {"val_loss", "val_ts", "val_ts_rounded"} <= set(m)


def test_run_test_cli(data_dir, ae_ckpt, tmp_path):
    from driving_dirty_tpu.cli import run_test as rt

    task = RoadMapBCEv2(dict(link=data_dir, pretrained_path=ae_ckpt, **TINY_RM))
    trainer = Trainer(max_epochs=1, default_root_dir=str(tmp_path / "logs"),
                      limit_train_batches=1, limit_val_batches=1,
                      enable_progress_bar=False)
    result = trainer.fit(task)

    out = rt.main([
        "--rm_ckpt_path", result.last_ckpt_path,
        "--link", data_dir,
        "--batch_size", "2",
        "--samples_per_scene", "4",
        "--num_labeled_scenes", "3",
        "--limit_batches", "2",
        "--out", str(tmp_path / "masks.npz"),
    ])
    assert out["n_scenes"] == 4
    assert 0.0 <= out["avg_ts"] <= 1.0
    assert out["scenes_per_sec"] > 0
    masks = np.load(tmp_path / "masks.npz")["masks"]
    assert masks.shape == (4, 800, 800)
