"""Real-TPU convergence gate: the models must LEARN, not just optimize.

Round-4 targets (VERDICT r3 items 1 + 3 — each bar carries information at
BOTH ends; no metric saturates and no single blip passes):

  1. BasicAE:          val MSE drops > 30% on a structured (cross-view
                       correlated) synthetic set — the pretext task has real
                       signal here, unlike pure noise.
  2. RoadMapBCEv2:     SSL-transfer A/B on the image-dependent,
                       noise-capped road target (ceiling ~0.70): frozen
                       PRETRAINED encoder must land in a mid-range TS band
                       AND beat the frozen RANDOM encoder arm — the
                       reference pipeline's transfer premise, measured.
  3. FasterRCNNRoadMap sustained val_ats >= 0.05 over the final 5 epochs
                       AND final RPN recall >= 0.8 on layout-aligned
                       painted boxes (probe-validated learnable config:
                       scripts/probe_det_learn.py).

Run on the real TPU (no JAX_PLATFORMS override):

    python scripts/run_tpu_gate.py [--out artifacts/convergence_gate]
    python scripts/run_tpu_gate.py --stages det --det_epochs 100  # rerun one

Copies each run's metrics JSONL to <out>/tpu_<task>.jsonl and writes/merges
<out>/tpu_gate_summary.json with the per-gate verdicts.
"""
import argparse
import glob
import json
import os
import re
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


def run_fit(task, epochs, args, out_name=None):
    from driving_dirty_tpu.train.trainer import Trainer

    r = Trainer(max_epochs=epochs, default_root_dir=args.logs,
                log_every_n_steps=5, enable_progress_bar=True).fit(task)
    mp = metrics_path(args.logs, task.name)
    shutil.copy(mp, os.path.join(args.out, f"tpu_{out_name or task.name}.jsonl"))
    return r, mp


def find_ae_ckpt(args):
    """Latest AE checkpoint from a prior gate-1 run (for --stages rm alone)."""
    for name in ("best.ckpt", "last.ckpt"):
        paths = sorted(
            glob.glob(os.path.join(args.logs, "basic_ae", "version_*", name)),
            # numeric version order: lexicographic puts version_9 above
            # version_10 (ADVICE r4)
            key=lambda p: int(re.search(r"version_(\d+)", p).group(1)),
        )
        if paths:
            return paths[-1]
    raise SystemExit("no basic_ae checkpoint under --logs; run the ae stage first")


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
    """Re-armed roadmap gate (VERDICT r3 item 3): FROZEN-encoder fine-tune on
    the image-dependent noise-capped road target, run as an SSL-transfer A/B:

      arm 'pre'  — encoder from the gate-1 pretrained AE,
      arm 'rand' — encoder random-init (pretrained_path=None),

    both frozen for the whole run so only representation quality differs
    (the reference pipeline's premise, roadmap_pretrain_ae.py:43-47). Gates:
    TS_pre inside a mid-range band (the label noise caps the ceiling at
    ~0.70 — see data/synthetic.py road_noise) AND TS_pre > TS_rand by a
    positive transfer delta."""
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    print("== gate 2: RoadMapBCEv2 (SSL-transfer A/B) ==", flush=True)
    pretrained = pretrained or find_ae_ckpt(args)

    def arm(tag, pre):
        rm = RoadMapBCEv2(dict(pretrained_path=pre,
                               # the RANDOM arm must build the SAME AE dims
                               # the checkpointed arm embeds (gate 1 trains
                               # hidden 64 / latent 32) — otherwise the A/B
                               # compares different capacities, not
                               # representations
                               ae_hidden_dim=64, ae_latent_dim=32,
                               batch_size=8, learning_rate=1e-2, precision=16,
                               unfreeze_epoch_no=10**6,  # frozen throughout
                               num_labeled_scenes=args.scenes, **args.data_kw))
        _, mp = run_fit(rm, args.rm_epochs, args, out_name=f"roadmap_{tag}")
        ts = read_series(mp, "val_ts_rounded")
        return (max(ts) if ts else 0.0), (ts[-1] if ts else None)

    best_pre, last_pre = arm("pre", pretrained)
    best_rand, last_rand = arm("rand", None)
    delta = best_pre - best_rand
    # Band calibration (measured r4): a FROZEN-encoder linear readout of the
    # 9-position task reaches TS ~0.12-0.2 in 30 epochs — far off both the
    # 0 floor and the 0.70 noise ceiling, so the metric is informative at
    # both ends. The floor asserts non-trivial learning; the ceiling guards
    # against the r3 failure mode (metric saturated at 1.0, zero
    # information); the delta is the SSL-transfer claim itself.
    band = (0.10, 0.60)
    ok = (band[0] <= best_pre <= band[1]) and delta > 0.0
    summary["roadmap"] = {
        "val_ts_pretrained_best": best_pre, "val_ts_pretrained_last": last_pre,
        "val_ts_random_best": best_rand, "val_ts_random_last": last_rand,
        "ssl_transfer_delta": delta, "band": list(band),
        "target": f"band {band} + delta > 0", "ok": ok,
    }
    print(f"roadmap TS pre {best_pre:.4f} vs rand {best_rand:.4f} "
          f"(delta {delta:+.4f}): {'OK' if ok else 'FAIL'}", flush=True)


def gate_det(args, summary):
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    print("== gate 3: FasterRCNNRoadMap ==", flush=True)
    det = FasterRCNNRoadMap(dict(pretrained_path=None, batch_size=4,
                                 learning_rate=args.det_lr, precision=16,
                                 unfreeze_epoch_no=0, max_bb=16,
                                 # the probe-validated learnable config
                                 # (scripts/probe_det_learn.py reaches ATS
                                 # 0.12 / recall 0.75 by step 400): single
                                 # 44 px box scale + matching single anchor
                                 # type, dilated+normed RPN head for the
                                 # receptive field the reference trunk
                                 # lacks — see nn/detection.DetectionConfig
                                 # for the measured failure modes
                                 anchor_sizes=(44,), anchor_ratios=(1.0,),
                                 rpn_head_dilations=(4, 8, 16),
                                 rpn_head_norm=1,
                                 val_ats=1, val_ats_score_thresh=0.05,
                                 num_labeled_scenes=args.scenes, **args.data_kw))
    _, mp = run_fit(det, args.det_epochs, args)
    ats = read_series(mp, "val_ats")
    rec = read_series(mp, "val_rpn_recall")
    # Re-armed bar (VERDICT r3 item 1): a single lucky blip no longer
    # passes — the detector must SUSTAIN val_ats >= 0.05 across the final
    # five epochs AND end with RPN recall >= 0.8 (the stage-wise diagnostic
    # that localizes a failure to the proposal stage).
    sustained = min(ats[-5:]) if len(ats) >= 5 else 0.0
    rec_last = rec[-1] if rec else 0.0
    ok = sustained >= 0.05 and rec_last >= 0.8
    summary["detection"] = {
        "val_ats_last": ats[-1] if ats else None,
        "val_ats_best": max(ats) if ats else 0.0,
        "val_ats_sustained_last5": sustained,
        "val_rpn_recall_last": rec_last,
        "target": "min(val_ats[-5:]) >= 0.05 and rpn_recall >= 0.8",
        "ok": ok,
    }
    print(f"detection val_ats last5-min {sustained:.4f}, rpn_recall "
          f"{rec_last:.4f}: {'OK' if ok else 'FAIL'}", flush=True)


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
    # a partial rerun (--stages without 'ae') must keep the earlier stages'
    # logs — gate 2 resolves the pretrained encoder from the prior gate-1
    # checkpoint under --logs (find_ae_ckpt)
    if os.path.isdir(args.logs) and "ae" in stages:
        shutil.rmtree(args.logs)
    if not os.path.isdir(args.data):
        print("generating structured synthetic dataset...", flush=True)
        generate(args.data, scenes=args.scenes, samples=args.samples,
                 labeled_scenes=args.scenes, seed=0,
                 structured=True, paint_boxes=True,
                 road_from_tint=True, road_noise=(0.2, 0.01),
                 paint_scale=(44.0, 44.0))
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
