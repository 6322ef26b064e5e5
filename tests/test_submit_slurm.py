"""Slurm emission + walltime-resubmit contract (reference run_on_cluster,
/root/reference/src/submit.py:49-74): --emit_slurm writes one sbatch script
per grid trial carrying resources, email notify, conda activation, and the
checkpoint-before-walltime resubmit loop (exit code 3 -> sbatch "$0" with
--resume_from_checkpoint last.ckpt)."""
import os
import subprocess
import sys

import pytest

from driving_dirty_tpu.cli.submit import _slurm_time_to_minutes, main
from driving_dirty_tpu.data.synthetic import generate


def test_slurm_time_to_minutes():
    assert _slurm_time_to_minutes("24:00:00") == 1440
    assert _slurm_time_to_minutes("1-02:30:00") == 1590
    assert _slurm_time_to_minutes("90") == 90
    assert _slurm_time_to_minutes("30:30") == 30.5


def test_emit_slurm_scripts(tmp_path):
    out = tmp_path / "sbatch"
    scripts = main([
        "--model", "basic_ae", "--link", "/data/dd",
        "--emit_slurm", str(out), "--nb_hopt_trials", "4",
        "--slurm_time", "2:00:00", "--slurm_gres", "gpu:k80:1",
        "--notify_email", "a@example.com", "--conda_env", "dd",
        "--tt_name", "grid", "--logs_save_path", str(tmp_path / "logs"),
    ])
    assert len(scripts) == 4
    assert os.path.exists(out / "submit_all.sh")
    driver = (out / "submit_all.sh").read_text()
    assert driver.count("sbatch ") == 4

    s0 = (out / "trial_0.sh").read_text()
    # resources + notify + env (reference submit.py:55-66)
    assert "#SBATCH --time=2:00:00" in s0
    assert "#SBATCH --cpus-per-task=10" in s0
    assert "#SBATCH --mem=30GB" in s0
    assert "#SBATCH --gres=gpu:k80:1" in s0
    assert "#SBATCH --mail-user=a@example.com" in s0
    assert "#SBATCH --mail-type=END,FAIL" in s0
    assert "source activate dd" in s0
    # pre-walltime SIGTERM safety net + in-process budget
    assert "#SBATCH --signal=B:TERM@300" in s0
    assert "--walltime_minutes 120.0" in s0
    # resume-if-checkpoint-exists guard + resubmit-on-walltime loop; the
    # trainer writes <trial_root>/<task.name>/last.ckpt
    assert '[ -f "$CKPT" ] && RESUME="--resume_from_checkpoint $CKPT"' in s0
    assert "/trial_0/basic_ae/last.ckpt" in s0
    assert "if [ $rc -eq 3 ]; then" in s0
    assert 'sbatch "$0"' in s0
    # the trial command is a --single_run with the grid overrides, and the
    # orchestration flags themselves are stripped from it
    assert "--single_run" in s0 and "--latent_dim" in s0
    assert "--emit_slurm" not in s0 and "--notify_email" not in s0
    assert "--tt_name trial_0" in s0
    assert os.access(out / "trial_0.sh", os.X_OK)

    # distinct grid points across scripts
    s1 = (out / "trial_1.sh").read_text()
    cmd0 = next(l for l in s0.splitlines() if "driving_dirty_tpu.cli.submit" in l)
    cmd1 = next(l for l in s1.splitlines() if "driving_dirty_tpu.cli.submit" in l)
    assert cmd0 != cmd1


def test_emit_slurm_minimal_omits_optional(tmp_path):
    out = tmp_path / "sbatch"
    main(["--model", "bb_mlp", "--emit_slurm", str(out),
          "--logs_save_path", str(tmp_path / "logs")])
    s = (out / "trial_0.sh").read_text()
    assert "--partition" not in s and "--gres" not in s
    assert "--mail-user" not in s and "source activate" not in s
    assert "#SBATCH --time=24:00:00" in s  # reference default walltime


@pytest.mark.heavy
def test_walltime_stop_exits_3_and_resumes(tmp_path):
    """The contract the sbatch scripts rely on: a run that hits its walltime
    budget checkpoints and exits 3; rerunning with --resume_from_checkpoint
    finishes and exits 0."""
    data = tmp_path / "data"
    generate(str(data), scenes=2, samples=2, labeled_scenes=1, seed=0)
    logs = tmp_path / "logs"
    base = [
        sys.executable, "-m", "driving_dirty_tpu.cli.submit",
        "--model", "basic_ae", "--single_run", "--link", str(data),
        "--tt_name", "wt", "--logs_save_path", str(logs),
        "--hidden_dim", "8", "--latent_dim", "8", "--batch_size", "2",
        "--max_epochs", "1", "--limit_train_batches", "2",
        "--limit_val_batches", "1", "--num_workers", "1",
        "--samples_per_scene", "2", "--num_unlabeled_scenes", "2",
        "--output_img_freq", "0",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # budget of 5 min with checkpoint-5-min-early => stops after step 1
    p1 = subprocess.run(base + ["--walltime_minutes", "5"], env=env,
                        capture_output=True, text=True, timeout=540)
    assert p1.returncode == 3, p1.stdout[-2000:] + p1.stderr[-2000:]
    ckpt = logs / "wt" / "basic_ae" / "last.ckpt"  # single_run: no trial_i subdir
    assert ckpt.exists()
    p2 = subprocess.run(base + ["--resume_from_checkpoint", str(ckpt)], env=env,
                        capture_output=True, text=True, timeout=540)
    assert p2.returncode == 0, p2.stdout[-2000:] + p2.stderr[-2000:]
