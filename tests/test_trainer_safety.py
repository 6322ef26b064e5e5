"""Trainer checkpoint-safety behaviors (ADVICE r3 fixes):

  * _link_latest must never delete a REGULAR file (a pre-versioning layout's
    real checkpoint) when refreshing the task-level convenience symlink;
  * _prune_to_template drops checkpoint leaves absent from the current model
    (c3-only param-tree slimming) and raises on genuinely missing leaves;
  * the AsyncWriter's on_written hook fires only after the file is on disk.
"""
import os

import numpy as np
import pytest

from driving_dirty_tpu.train.trainer import Trainer, _prune_to_template


def test_link_latest_preserves_pre_versioning_checkpoint(tmp_path):
    task_dir = tmp_path / "roadmap_bce"
    run_dir = task_dir / "version_0"
    run_dir.mkdir(parents=True)
    (run_dir / "last.ckpt").write_bytes(b"new")
    # old-layout REAL checkpoint at the link location
    (task_dir / "last.ckpt").write_bytes(b"precious")
    Trainer._link_latest(str(run_dir), "last.ckpt")
    assert not os.path.islink(task_dir / "last.ckpt")
    assert (task_dir / "last.ckpt").read_bytes() == b"precious"


def test_link_latest_replaces_symlink(tmp_path):
    task_dir = tmp_path / "roadmap_bce"
    for v in (0, 1):
        (task_dir / f"version_{v}").mkdir(parents=True)
        (task_dir / f"version_{v}" / "last.ckpt").write_bytes(b"%d" % v)
    Trainer._link_latest(str(task_dir / "version_0"), "last.ckpt")
    Trainer._link_latest(str(task_dir / "version_1"), "last.ckpt")
    link = task_dir / "last.ckpt"
    assert os.path.islink(link)
    assert link.read_bytes() == b"1"


def test_prune_to_template_drops_extra_and_raises_on_missing():
    loaded = {"encoder": {"c1": 1, "c2": 2, "fc1": {"w": 3}}, "head": {"w": 4}}
    template = {"encoder": {"c1": 0, "c2": 0}, "head": {"w": 0}}
    out, pruned = _prune_to_template(loaded, template, "t")
    assert out == {"encoder": {"c1": 1, "c2": 2}, "head": {"w": 4}}
    assert pruned == {"encoder/fc1"}

    with pytest.raises(ValueError, match="missing"):
        _prune_to_template({"encoder": {"c1": 1}}, template, "t")


def test_async_writer_on_written_after_file_exists(tmp_path):
    from driving_dirty_tpu.checkpoints import io as ckpt_io

    w = ckpt_io.AsyncWriter()
    path = str(tmp_path / "x.ckpt")
    seen = {}

    def hook():
        seen["existed"] = os.path.exists(path)

    w.save(path, params={"a": np.zeros(3)}, hparams={}, meta={}, on_written=hook)
    w.wait()
    w.close()
    assert seen == {"existed": True}
