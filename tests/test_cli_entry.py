"""Drive the inference CLI entry points end-to-end through their main()s:
run_test (the reference's documented surface, README.md:33-37) and eval_boxes
(the box-metric eval the reference left commented out). Everything runs on
tiny synthetic data with reduced model dims; what's exercised is the full
restore -> loader -> jitted predict -> metric -> output-file chain.
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 compiles: fast tier runs -m "not heavy"

import jax

from driving_dirty_tpu.checkpoints import io as ckpt_io
from driving_dirty_tpu.data.synthetic import generate
from driving_dirty_tpu.models.basic_ae import BasicAE
from driving_dirty_tpu.models.roadmap import RoadMapBCEv2
from driving_dirty_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dd_cli")
    generate(str(d), scenes=3, samples=4, labeled_scenes=3, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def rm_ckpt(data_dir, tmp_path_factory):
    """A briefly-trained RoadMapBCEv2 checkpoint (AE pretrain -> finetune,
    the reference's cross-stage chain)."""
    logs = tmp_path_factory.mktemp("cli_logs")
    ae = Trainer(max_epochs=1, default_root_dir=str(logs / "ae"),
                 limit_train_batches=1, limit_val_batches=1,
                 enable_progress_bar=False).fit(
        BasicAE(dict(link=data_dir, hidden_dim=8, latent_dim=8, batch_size=2,
                     samples_per_scene=4, num_unlabeled_scenes=3)))
    rm = Trainer(max_epochs=1, default_root_dir=str(logs / "rm"),
                 limit_train_batches=1, limit_val_batches=1,
                 enable_progress_bar=False).fit(
        RoadMapBCEv2(dict(link=data_dir, pretrained_path=ae.last_ckpt_path,
                          batch_size=2, samples_per_scene=4,
                          num_labeled_scenes=3)))
    return rm.last_ckpt_path


def test_run_test_main(data_dir, rm_ckpt, tmp_path, capsys):
    from driving_dirty_tpu.cli import run_test

    out_npz = str(tmp_path / "masks.npz")
    run_test.main([
        "--rm_ckpt_path", rm_ckpt, "--link", data_dir,
        "--batch_size", "2", "--limit_batches", "2",
        "--samples_per_scene", "4", "--num_labeled_scenes", "3",
        "--out", out_npz,
    ])
    printed = capsys.readouterr().out
    assert "threat score" in printed.lower() or "ts" in printed.lower()
    with np.load(out_npz) as z:
        masks = z[z.files[0]]
    assert masks.shape[-2:] == (800, 800)
    assert masks.dtype == bool or set(np.unique(masks)) <= {0, 1}


def test_eval_boxes_main(data_dir, tmp_path, capsys):
    from driving_dirty_tpu.cli import eval_boxes
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    hparams = dict(pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
                   batch_size=2, samples_per_scene=4, num_labeled_scenes=3,
                   link=data_dir, rpn_pre_nms_top_n=64, rpn_post_nms_top_n=32,
                   box_batch_per_image=32)
    task = FasterRCNNRoadMap(hparams)
    params, state = task.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "fr.ckpt")
    ckpt_io.save(ckpt, params=params, state=state, hparams=hparams,
                 meta={"task": "faster_rcnn_rm"})

    result = eval_boxes.main([
        "--ckpt_path", ckpt, "--link", data_dir,
        "--batch_size", "2", "--limit_batches", "1",
        "--samples_per_scene", "4", "--num_labeled_scenes", "3",
    ])
    printed = capsys.readouterr().out
    assert "avg_box_ts" in printed
    assert result["n_scenes"] > 0
    assert np.isfinite(result["avg_box_ts"])
