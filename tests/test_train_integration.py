"""End-to-end integration: synthetic dataset -> BasicAE training ->
checkpoint -> restore (SURVEY.md §4.5)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles / full fits: fast tier runs -m "not heavy"

import jax

from driving_dirty_tpu.checkpoints import io as ckpt_io
from driving_dirty_tpu.data.synthetic import generate
from driving_dirty_tpu.models.basic_ae import BasicAE
from driving_dirty_tpu.train.trainer import Trainer

TINY = dict(
    hidden_dim=8,
    latent_dim=8,
    batch_size=2,
    learning_rate=1e-3,
    samples_per_scene=4,
    num_unlabeled_scenes=3,
    output_img_freq=500,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dd_data")
    generate(str(d), scenes=3, samples=4, labeled_scenes=2, seed=0)
    return str(d)


def test_basic_ae_fit_and_checkpoint(data_dir, tmp_path):
    task = BasicAE(dict(link=data_dir, **TINY))
    trainer = Trainer(
        max_epochs=2,
        default_root_dir=str(tmp_path / "logs"),
        limit_train_batches=2,
        limit_val_batches=1,
        enable_progress_bar=False,
    )
    result = trainer.fit(task)
    assert np.isfinite(result.best_val_loss)
    assert result.last_ckpt_path and os.path.exists(result.last_ckpt_path)
    assert result.best_ckpt_path and os.path.exists(result.best_ckpt_path)
    assert result.scenes_per_sec > 0

    # restore: embedded hparams rebuild the model (Lightning
    # load_from_checkpoint semantics, SURVEY.md §5.4b)
    blob = ckpt_io.load(result.last_ckpt_path)
    assert blob["hparams"]["latent_dim"] == 8
    restored = BasicAE(blob["hparams"])
    params = blob["params"]
    x = jax.numpy.zeros((1, 6, 256, 306, 3))
    y_hat, y, _ = restored.forward(
        params, blob["state"], x, train=False, rng=jax.random.PRNGKey(0)
    )
    assert y_hat.shape == (1, 256, 306, 3)


def test_resume_from_checkpoint(data_dir, tmp_path):
    task = BasicAE(dict(link=data_dir, **TINY))
    trainer = Trainer(
        max_epochs=1,
        default_root_dir=str(tmp_path / "logs"),
        limit_train_batches=1,
        limit_val_batches=1,
        enable_progress_bar=False,
    )
    r1 = trainer.fit(task)
    trainer2 = Trainer(
        max_epochs=2,
        default_root_dir=str(tmp_path / "logs2"),
        limit_train_batches=1,
        limit_val_batches=1,
        enable_progress_bar=False,
    )
    r2 = trainer2.fit(task, resume_from=r1.last_ckpt_path)
    assert r2.last_ckpt_path is not None


def test_fit_on_virtual_8device_mesh(data_dir, tmp_path):
    # Data-parallel training over the 8-device virtual CPU mesh (conftest).
    from driving_dirty_tpu.parallel import mesh as mesh_lib

    assert len(jax.devices()) == 8
    mesh = mesh_lib.build_mesh(8, 1)
    task = BasicAE(dict(link=data_dir, **{**TINY, "batch_size": 8}))
    trainer = Trainer(
        max_epochs=1,
        default_root_dir=str(tmp_path / "logs"),
        mesh=mesh,
        limit_train_batches=2,
        limit_val_batches=1,
        enable_progress_bar=False,
    )
    result = trainer.fit(task)
    assert np.isfinite(result.best_val_loss)


def test_periodic_and_preemption_checkpointing(data_dir, tmp_path):
    import os as _os

    task = BasicAE(dict(link=data_dir, **TINY))
    trainer = Trainer(
        max_epochs=1,
        default_root_dir=str(tmp_path / "logs"),
        limit_train_batches=3,
        limit_val_batches=0,
        enable_progress_bar=False,
        checkpoint_every_n_steps=2,
    )
    trainer.fit(task)
    ckpt = tmp_path / "logs" / "basic_ae" / "last.ckpt"
    assert ckpt.exists()
    blob = ckpt_io.load(str(ckpt))
    assert blob["meta"]["global_step"] >= 2

    # preemption: SIGTERM-equivalent flag stops the loop after a checkpoint
    trainer2 = Trainer(
        max_epochs=5,
        default_root_dir=str(tmp_path / "logs2"),
        limit_train_batches=3,
        limit_val_batches=0,
        enable_progress_bar=False,
    )
    trainer2._preempted = True  # what the SIGTERM handler sets
    result = trainer2.fit(task)
    assert result.last_ckpt_path and _os.path.exists(result.last_ckpt_path)
    blob = ckpt_io.load(result.last_ckpt_path)
    assert blob["meta"].get("mid_epoch") is True


def test_walltime_budget_stops_with_resumable_checkpoint(data_dir, tmp_path):
    # test-tube's minutes_to_checkpoint_before_walltime (reference
    # submit.py:64-65): a run whose walltime budget is already exhausted
    # stops after one step with a mid-epoch resumable checkpoint.
    task = BasicAE(dict(link=data_dir, **TINY))
    trainer = Trainer(
        max_epochs=5,
        default_root_dir=str(tmp_path / "logs"),
        limit_train_batches=3,
        limit_val_batches=0,
        enable_progress_bar=False,
        walltime_minutes=0.0,             # budget already spent
        checkpoint_before_walltime_minutes=0.0,
    )
    result = trainer.fit(task)
    assert result.last_ckpt_path and os.path.exists(result.last_ckpt_path)
    blob = ckpt_io.load(result.last_ckpt_path)
    assert blob["meta"].get("mid_epoch") is True
    assert blob["opt_state"] is not None


def test_donation_disabled_on_axon_platform(tmp_path, monkeypatch):
    """The tunneled 'axon' TPU crashes its worker on donated-buffer reuse, but
    registers its backend as plain 'tpu' — so the Trainer's guard must key on
    the JAX_PLATFORMS env, not jax.default_backend() (r2 regression: the
    backend-name check never fired and every CLI train run used the
    fused+donated program)."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    tr = Trainer(max_epochs=1, default_root_dir=str(tmp_path))
    assert tr.donate_buffers is False

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    tr = Trainer(max_epochs=1, default_root_dir=str(tmp_path))
    assert tr.donate_buffers is True


def test_fit_with_accumulation_and_clipping(data_dir, tmp_path):
    """Whole-trainer path with the Lightning-surface optimizer features:
    --accumulate_grad_batches 2 + --gradient_clip_val: params must change
    (the accumulated step fires) and training must stay finite."""
    task = BasicAE(dict(
        link=data_dir, hidden_dim=8, latent_dim=8, batch_size=2,
        samples_per_scene=4, num_unlabeled_scenes=3, output_img_freq=0,
    ))
    before = None

    trainer = Trainer(
        max_epochs=1, default_root_dir=str(tmp_path / "acc"),
        limit_train_batches=4, limit_val_batches=1,
        enable_progress_bar=False, gradient_clip_val=0.5,
        accumulate_grad_batches=2,
    )
    params, _ = task.init(jax.random.PRNGKey(0))
    before = jax.tree.leaves(params)[0].copy()
    result = trainer.fit(task)
    after = jax.tree.leaves(result.params)[0]
    assert np.isfinite(result.best_val_loss)
    assert np.any(np.asarray(before) != np.asarray(after))


def test_val_host_hook_perkey_weighting(tmp_path):
    """Host-hook metrics (val_ats) use PER-KEY weights: a batch where the
    hook returns nothing must not dilute the epoch aggregate, and a
    (value, weight) return overrides the batch weight (the hook's mean may
    cover fewer rows than the batch)."""
    import jax.numpy as jnp

    class FakeTask:
        name = "fake"

        def val_loader(self):
            b0 = ({"x": np.zeros((4, 1), np.float32), "i": np.array([0])},
                  np.ones(4, bool))
            b1 = ({"x": np.zeros((4, 1), np.float32), "i": np.array([1])},
                  np.ones(4, bool))
            return [b0, b1]

        def val_metrics(self, params, state, batch, rng):
            return {"val_loss": jnp.float32(1.0)}

        def host_val_metrics(self, params, state, batch, bmask):
            # only the first batch has any GT: mean 0.8 over 2 images
            return {"val_ats": (0.8, 2.0)} if int(batch["i"][0]) == 0 else {}

    trainer = Trainer(default_root_dir=str(tmp_path), enable_checkpointing=False,
                      enable_progress_bar=False)
    task = FakeTask()
    out = trainer._run_validation(task, trainer._make_val_step(task), {}, {},
                                  jax.random.PRNGKey(0))
    assert out["val_loss"] == pytest.approx(1.0)
    # NOT 0.8 * 2/(2+4) or 0.8/2 — the empty-hook batch contributes no weight
    assert out["val_ats"] == pytest.approx(0.8)


def test_experiment_versioning(data_dir, tmp_path):
    """New runs get fresh version_N dirs; resume keeps its version; the
    task-level last.ckpt symlink tracks the newest run (test-tube versioned
    experiments, /root/reference/src/submit.py:36-37)."""
    root = str(tmp_path / "logs")
    task = BasicAE(dict(link=data_dir, **TINY))
    kw = dict(limit_train_batches=1, limit_val_batches=1, enable_progress_bar=False)

    r1 = Trainer(max_epochs=1, default_root_dir=root, **kw).fit(task)
    assert os.sep + "version_0" + os.sep in r1.last_ckpt_path
    r2 = Trainer(max_epochs=1, default_root_dir=root, **kw).fit(task)
    assert os.sep + "version_1" + os.sep in r2.last_ckpt_path
    # the convenience symlink points at the NEWEST version
    link = os.path.join(root, task.name, "last.ckpt")
    assert os.path.islink(link)
    assert os.path.realpath(link) == os.path.realpath(r2.last_ckpt_path)

    # resuming through the symlink stays in version_1 — no new version dir
    r3 = Trainer(max_epochs=2, default_root_dir=root, **kw).fit(task, resume_from=link)
    assert os.sep + "version_1" + os.sep in r3.last_ckpt_path
    assert not os.path.isdir(os.path.join(root, task.name, "version_2"))

    # pinning --version reuses that dir
    r4 = Trainer(max_epochs=1, default_root_dir=root, version=7, **kw).fit(task)
    assert os.sep + "version_7" + os.sep in r4.last_ckpt_path


def test_profile_dir_writes_trace(data_dir, tmp_path):
    """--profile_dir captures a jax.profiler trace of steps 2-8 (re-enabled
    for all platforms after the axon re-verification, 2026-08-20)."""
    task = BasicAE(dict(link=data_dir, **TINY))
    prof = str(tmp_path / "trace")
    Trainer(max_epochs=1, default_root_dir=str(tmp_path / "logs"),
            limit_train_batches=4, limit_val_batches=1,
            enable_progress_bar=False, enable_checkpointing=False,
            profile_dir=prof).fit(task)
    files = [os.path.join(r, n) for r, _, ns in os.walk(prof) for n in ns]
    assert any(n.endswith(".xplane.pb") for n in files), files
