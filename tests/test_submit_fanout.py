"""Concurrent trial fan-out (VERDICT r1 item 6): submit.py --on_cluster runs
N trials as concurrent subprocesses pinned to disjoint device subsets, with
per-trial logs and a summary — the TPU-native
optimize_parallel_cluster_gpu(nb_trials=12)
(/root/reference/src/submit.py:72-74)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # spawns training subprocesses

from driving_dirty_tpu.cli.submit import _strip_flags, _trial_env, grid_trials, main
from driving_dirty_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dd_fanout")
    generate(str(d), scenes=3, samples=2, labeled_scenes=2, seed=0)
    return str(d)


def test_strip_flags_pairs_and_eq():
    argv = ["--model", "basic_ae", "--on_cluster", "--parallel_trials", "2",
            "--gpus=4", "--link", "/x", "--nb_hopt_trials", "2"]
    out = _strip_flags(
        argv,
        value_flags={"--parallel_trials", "--nb_hopt_trials", "--gpus"},
        bare_flags={"--on_cluster"},
    )
    assert out == ["--model", "basic_ae", "--link", "/x"]


def test_trial_env_disjoint_tpu_pinning(monkeypatch):
    monkeypatch.setenv("TPU_NAME", "v5e-8")
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    # pinning is by concurrency SLOT, not trial index: trial 5 in slot 1 of
    # a 2-wide pool reuses chips 4-7, never chips 20-23 of an 8-chip host
    e0 = _trial_env(0, slot=0, devices_per_trial=4)
    e1 = _trial_env(5, slot=1, devices_per_trial=4)
    assert e0["TPU_VISIBLE_DEVICES"] == "0,1,2,3"
    assert e1["TPU_VISIBLE_DEVICES"] == "4,5,6,7"
    assert e1["DD_TRIAL_INDEX"] == "5"


def test_two_trial_concurrent_run(data_dir, tmp_path):
    # 2 trials x 2 virtual CPU devices each, concurrently; each trial fits
    # BasicAE for one tiny epoch and reports a finite val_loss.
    results = main([
        "--model", "basic_ae",
        "--link", data_dir,
        "--on_cluster", "--parallel_trials", "2", "--nb_hopt_trials", "2",
        "--gpus", "4",
        "--tt_name", "fanout_test",
        "--logs_save_path", str(tmp_path),
        "--hidden_dim", "8", "--latent_dim", "8", "--batch_size", "2",
        "--max_epochs", "1", "--limit_train_batches", "1",
        "--limit_val_batches", "1", "--num_workers", "2",
        "--samples_per_scene", "2", "--num_unlabeled_scenes", "3",
        "--output_img_freq", "0",
    ])
    assert len(results) == 2
    for r in results:
        assert r["rc"] == 0, open(r["log"]).read()[-2000:]
        assert r["val_loss"] is not None and np.isfinite(r["val_loss"])
        assert os.path.exists(r["log"])
    # the two trials are distinct grid points
    ovs = [tuple(sorted(r["overrides"].items())) for r in results]
    assert len(set(ovs)) == 2
    assert grid_trials("basic_ae", 2) == [r["overrides"] for r in sorted(results, key=lambda r: r["trial"])]


def test_on_done_cmd_hook(tmp_path):
    from types import SimpleNamespace

    from driving_dirty_tpu.cli.submit import _notify_done

    sentinel = tmp_path / "done.txt"
    args = SimpleNamespace(
        on_done_cmd=f'echo "$DD_TRIAL_NAME rc=$DD_TRIAL_RC vl=$DD_TRIAL_VAL_LOSS" > {sentinel}'
    )
    _notify_done(args, "trial_3", 0, 0.125)
    assert sentinel.read_text().strip() == "trial_3 rc=0 vl=0.125"
    _notify_done(SimpleNamespace(on_done_cmd=None), "x", 1, None)  # no-op
