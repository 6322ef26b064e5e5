"""Real-TPU convergence gate: the models must LEARN, not just optimize.

Round-3 targets (VERDICT r2 item 5 — the closest available proxy to
BASELINE.md's 0.8529 val TS, since no real dataset exists in any environment
this repo has run in):

  1. BasicAE:          val MSE drops > 30% on a structured (cross-view
                       correlated) synthetic set — the pretext task has real
                       signal here, unlike pure noise.
  2. RoadMapBCEv2:     val TS > 0.5 on the learnable fixed-road target.
  3. FasterRCNNRoadMap val_ats > 0 at the eval score floor (0.05) on a set
                       whose camera views have the GT boxes painted in.

Run on the real TPU (no JAX_PLATFORMS override):

    python scripts/run_tpu_gate.py [--out artifacts/convergence_gate]
    python scripts/run_tpu_gate.py --stages det --det_epochs 40   # rerun one

Copies each run's metrics JSONL to <out>/tpu_<task>.jsonl and writes/merges
<out>/tpu_gate_summary.json with the per-gate verdicts.
"""
import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def metrics_path(root, task_name):
    paths = sorted(
        glob.glob(os.path.join(root, task_name, "version_*", "tb", "metrics.jsonl")),
        key=lambda p: int(p.split("version_")[1].split(os.sep)[0]),
    )
    assert paths, f"no metrics under {root}/{task_name}"
    return paths[-1]


def read_series(path, key):
    out = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                out.append((rec["step"], rec[key]))
    return [v for _, v in sorted(out)]


def run_fit(task, epochs, args):
    from driving_dirty_tpu.train.trainer import Trainer

    r = Trainer(max_epochs=epochs, default_root_dir=args.logs,
                log_every_n_steps=5, enable_progress_bar=True).fit(task)
    mp = metrics_path(args.logs, task.name)
    shutil.copy(mp, os.path.join(args.out, f"tpu_{task.name}.jsonl"))
    return r, mp


def gate_ae(args, summary):
    from driving_dirty_tpu.models.basic_ae import BasicAE

    print("== gate 1: BasicAE ==", flush=True)
    ae = BasicAE(dict(hidden_dim=64, latent_dim=32, batch_size=16,
                      learning_rate=1e-3, precision=16,
                      num_unlabeled_scenes=args.scenes, **args.data_kw))
    r, mp = run_fit(ae, args.ae_epochs, args)
    mse = read_series(mp, "val_loss")
    drop = 1.0 - mse[-1] / mse[0] if mse and mse[0] > 0 else 0.0
    summary["ae"] = {"val_mse_first": mse[0] if mse else None,
                     "val_mse_last": mse[-1] if mse else None,
                     "drop": drop, "target": ">30% drop", "ok": drop > 0.30}
    print(f"AE val MSE {mse[0]:.5f} -> {mse[-1]:.5f} ({drop:.1%} drop): "
          f"{'OK' if summary['ae']['ok'] else 'FAIL'}", flush=True)
    return r.best_ckpt_path or r.last_ckpt_path


def gate_rm(args, summary, pretrained):
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    print("== gate 2: RoadMapBCEv2 ==", flush=True)
    rm = RoadMapBCEv2(dict(pretrained_path=pretrained,
                           batch_size=8, learning_rate=1e-2, precision=16,
                           unfreeze_epoch_no=0,
                           num_labeled_scenes=args.scenes, **args.data_kw))
    _, mp = run_fit(rm, args.rm_epochs, args)
    ts = read_series(mp, "val_ts_rounded")
    best_ts = max(ts) if ts else 0.0
    summary["roadmap"] = {"val_ts_last": ts[-1] if ts else None,
                          "val_ts_best": best_ts, "target": "> 0.5",
                          "ok": best_ts > 0.5}
    print(f"roadmap val TS best {best_ts:.4f}: "
          f"{'OK' if summary['roadmap']['ok'] else 'FAIL'}", flush=True)


def gate_det(args, summary):
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    print("== gate 3: FasterRCNNRoadMap ==", flush=True)
    det = FasterRCNNRoadMap(dict(pretrained_path=None, batch_size=4,
                                 learning_rate=args.det_lr, precision=16,
                                 unfreeze_epoch_no=0, max_bb=16,
                                 val_ats=1, val_ats_score_thresh=0.05,
                                 num_labeled_scenes=args.scenes, **args.data_kw))
    _, mp = run_fit(det, args.det_epochs, args)
    ats = read_series(mp, "val_ats")
    best_ats = max(ats) if ats else 0.0
    summary["detection"] = {"val_ats_last": ats[-1] if ats else None,
                            "val_ats_best": best_ats, "target": "> 0",
                            "ok": best_ats > 0.0}
    print(f"detection val_ats best {best_ats:.4f}: "
          f"{'OK' if summary['detection']['ok'] else 'FAIL'}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/convergence_gate")
    ap.add_argument("--data", default="/tmp/dd_gate_tpu")
    ap.add_argument("--logs", default="/tmp/dd_gate_tpu_logs")
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--ae_epochs", type=int, default=25)
    ap.add_argument("--rm_epochs", type=int, default=40)
    ap.add_argument("--det_epochs", type=int, default=15)
    ap.add_argument("--det_lr", type=float, default=1e-3)
    ap.add_argument("--stages", default="ae,rm,det",
                    help="comma subset of ae,rm,det — rerun one gate "
                         "without repeating the others (summary merges "
                         "into the existing tpu_gate_summary.json)")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.data.synthetic import generate

    enable_compilation_cache()
    if os.path.isdir(args.logs):
        shutil.rmtree(args.logs)
    if not os.path.isdir(args.data):
        print("generating structured synthetic dataset...", flush=True)
        generate(args.data, scenes=args.scenes, samples=args.samples,
                 labeled_scenes=args.scenes, seed=0, fixed_road=True,
                 structured=True, paint_boxes=True)
    os.makedirs(args.out, exist_ok=True)
    summary = {}
    prior = os.path.join(args.out, "tpu_gate_summary.json")
    if os.path.exists(prior):  # partial rerun merges over earlier results
        with open(prior) as f:
            summary = json.load(f)
    args.data_kw = dict(link=args.data, samples_per_scene=args.samples,
                        output_img_freq=0)
    t_all = time.time()

    pretrained = gate_ae(args, summary) if "ae" in stages else None
    if "rm" in stages:
        gate_rm(args, summary, pretrained)
    if "det" in stages:
        gate_det(args, summary)

    summary["wall_seconds"] = time.time() - t_all
    summary["all_ok"] = all(v["ok"] for v in summary.values()
                            if isinstance(v, dict) and "ok" in v)
    with open(prior, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
