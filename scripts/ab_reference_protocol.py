"""End-to-end reference-protocol A/B on shared synthetic data (VERDICT r4
item 3): the strongest "matches the reference" claim available without the
real dataset.

Two arms, SAME synthetic dataset / splits / hparams / epochs / seed policy:

  torch arm — the GENUINE reference modules
      (/root/reference/src/autoencoder/components.py Encoder/Decoder,
      imported by file path; they import only torch), hand-driven with
      Lightning 0.7.5 fit semantics, running the reference's published
      two-stage protocol:
        stage 1  six_to_one SSL pretraining (autoencoder.py:53-73,91:
                 reorder [0,1,2,5,4,3], stitch 6 views wide, zero one
                 306-px column chosen by np.random.randint(0,5), MSE on
                 the masked view), Adam(lr) (autoencoder.py:119-120);
        stage 2  frozen-encoder roadmap fine-tune (roadmap_bce_v2.py:43-50:
                 requires_grad=False encoder in train mode + Linear(latent
                 -> 640000), BCE-with-logits, val TS on round(sigmoid),
                 roadmap_bce_v2.py:106,139-140).
      (pytorch-lightning itself is not installed here; the hand-driven loop
      IS the pinned replication of its step semantics — zero_grad /
      backward / step each batch, module in train mode, val at epoch end.)

  jax arm — this framework's real product path: Trainer.fit(BasicAE) ->
      checkpoint -> Trainer.fit(RoadMapBCEv2(pretrained_path=...)) with the
      same hparams, reading val_ts_rounded from the metrics JSONL.

Both arms read the same scene dirs with the same scene-level 80/20 split
(data.dataset.scene_split, seed 20200505 — the reference's seed,
autoencoder.py:16-18). The dataset is the structured + road_from_tint +
road_noise synthetic config (data/synthetic.py): the road target is a
function of the images with a known noise ceiling, so a mid-range TS is
only reachable by actual representation transfer.

Caveats recorded in the artifact: per-step mask indices and init draws are
framework-local RNG (matched POLICY, not matched draws), so the comparison
is distributional — final val TS within a tolerance band, not bit equality.

Writes artifacts/ab_reference_protocol.json.
"""
import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_AE = "/root/reference/src/autoencoder/components.py"
SEED = 20200505
PANORAMA_ORDER = [0, 1, 2, 5, 4, 3]  # autoencoder.py:55


def ts_road_map(target, pred):
    """Threat score TP/(P1+P2-TP) (helper.py:74-77), numpy, framework-neutral
    — the same scalar both arms are judged by."""
    tp = float(np.sum((target > 0.5) & (pred > 0.5)))
    denom = float(np.sum(target > 0.5)) + float(np.sum(pred > 0.5)) - tp
    return tp / denom if denom > 0 else 1.0


# --------------------------------------------------------------------------
# shared data loading (loading is not under comparison; both arms get
# identical numpy arrays and the same scene-level split)
# --------------------------------------------------------------------------


def load_arrays(data_dir, scenes, samples_per_scene):
    from driving_dirty_tpu.data.dataset import (
        LabeledDataset,
        UnlabeledDataset,
        scene_split,
    )

    unl_scenes = np.arange(scenes)
    lab_scenes = np.arange(106, 106 + scenes)
    unl_tr, unl_va = scene_split(unl_scenes, seed=SEED)
    lab_tr, lab_va = scene_split(lab_scenes, seed=SEED)

    def unl(scene_idx):
        ds = UnlabeledDataset(data_dir, scene_index=np.asarray(scene_idx),
                              samples_per_scene=samples_per_scene)
        return np.stack([np.asarray(ds[i]) for i in range(len(ds))])

    def lab(scene_idx):
        ds = LabeledDataset(data_dir,
                            annotation_file=os.path.join(data_dir, "annotation.csv"),
                            scene_index=np.asarray(scene_idx),
                            samples_per_scene=samples_per_scene)
        ims, roads = [], []
        for i in range(len(ds)):
            item = ds[i]
            ims.append(np.asarray(item["images"]))
            roads.append(np.asarray(item["road"]))
        return np.stack(ims), np.stack(roads).astype(np.float32)

    return {
        "unl_train": unl(unl_tr), "unl_val": unl(unl_va),
        "lab_train": lab(lab_tr), "lab_val": lab(lab_va),
        "splits": {
            "unl_train": [int(s) for s in unl_tr],
            "unl_val": [int(s) for s in unl_va],
            "lab_train": [int(s) for s in lab_tr],
            "lab_val": [int(s) for s in lab_va],
        },
    }


# --------------------------------------------------------------------------
# torch arm
# --------------------------------------------------------------------------


def run_torch_arm(arrays, hp, log):
    import torch
    import torch.nn.functional as F

    spec = importlib.util.spec_from_file_location("ref_ae_components", REF_AE)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(SEED)
    np_rng = np.random.RandomState(SEED)

    h, w = arrays["unl_train"].shape[-3:-1]
    enc = ref.Encoder(hp["hidden_dim"], hp["latent_dim"], 3, h, 6 * w)
    dec = ref.Decoder(hp["hidden_dim"], hp["latent_dim"], 3, h, w)
    enc.train()
    dec.train()

    def to_t(x_nhwc):  # [b, 6, H, W, 3] -> [b, 6, 3, H, W] torch
        return torch.from_numpy(np.transpose(x_nhwc, (0, 1, 4, 2, 3)).copy())

    def stitch(x):  # [b, 6, 3, H, W] -> [b, 3, H, 6W] panorama order
        return torch.cat([x[:, i] for i in PANORAMA_ORDER], dim=3)

    def six_to_one(x, idx):
        wide = stitch(x)
        y = wide[..., idx * w:(idx + 1) * w].clone()
        masked = wide.clone()
        masked[..., idx * w:(idx + 1) * w] = 0
        return masked, y

    bs = hp["batch_size"]
    opt = torch.optim.Adam(list(enc.parameters()) + list(dec.parameters()),
                           lr=hp["ae_lr"])
    ae_curve = {"train_loss": [], "val_mse": []}
    for ep in range(hp["ae_epochs"]):
        order = np_rng.permutation(len(arrays["unl_train"]))
        ep_losses = []
        for i0 in range(0, len(order) - bs + 1, bs):
            x = to_t(arrays["unl_train"][order[i0:i0 + bs]])
            idx = np_rng.randint(0, 5)  # upper-exclusive: position 5 never
            # masked — the reference quirk (autoencoder.py:60), preserved
            masked, y = six_to_one(x, idx)
            opt.zero_grad()
            loss = F.mse_loss(y, dec(enc(masked)))
            loss.backward()
            opt.step()
            ep_losses.append(float(loss.detach()))
        # val at epoch end in eval mode (Lightning 0.7.5 validation runs
        # model.eval() + no_grad; note the genuine DenseBlock still applies
        # dropout in eval — the reference quirk — so torch val is
        # stochastic); fixed mask-index cycle for low-variance MSE
        enc.eval(); dec.eval()
        with torch.no_grad():
            vl = []
            for j in range(0, len(arrays["unl_val"]), bs):
                x = to_t(arrays["unl_val"][j:j + bs])
                masked, y = six_to_one(x, j % 5)
                vl.append(float(F.mse_loss(y, dec(enc(masked)))))
        enc.train(); dec.train()
        ae_curve["train_loss"].append(float(np.mean(ep_losses)))
        ae_curve["val_mse"].append(float(np.mean(vl)))
        log(f"  torch AE epoch {ep}: train {ae_curve['train_loss'][-1]:.5f} "
            f"val {ae_curve['val_mse'][-1]:.5f}")

    # ---- stage 2: frozen-encoder roadmap --------------------------------
    for p in enc.parameters():
        p.requires_grad_(False)
    enc.train()  # Lightning fit puts the whole module in train mode
    head = torch.nn.Linear(hp["latent_dim"], 800 * 800)
    opt2 = torch.optim.Adam(list(enc.parameters()) + list(head.parameters()),
                            lr=hp["rm_lr"])
    ims_tr, road_tr = arrays["lab_train"]
    ims_va, road_va = arrays["lab_val"]
    rm_curve = {"train_loss": [], "val_ts": []}
    for ep in range(hp["rm_epochs"]):
        order = np_rng.permutation(len(ims_tr))
        ep_losses = []
        for i0 in range(0, len(order) - bs + 1, bs):
            x = to_t(ims_tr[order[i0:i0 + bs]])
            tgt = torch.from_numpy(road_tr[order[i0:i0 + bs]])
            opt2.zero_grad()
            logits = head(enc(stitch(x))).view(-1, 800, 800)
            loss = F.binary_cross_entropy_with_logits(logits, tgt)
            loss.backward()
            opt2.step()
            ep_losses.append(float(loss.detach()))
        enc.eval(); head.eval()
        with torch.no_grad():
            preds = []
            for j in range(0, len(ims_va), bs):
                x = to_t(ims_va[j:j + bs])
                logits = head(enc(stitch(x))).view(-1, 800, 800)
                preds.append(torch.round(torch.sigmoid(logits)).numpy())
            pred = np.concatenate(preds)
        enc.train(); head.train()
        ts = float(np.mean([ts_road_map(road_va[k], pred[k])
                            for k in range(len(pred))]))
        rm_curve["train_loss"].append(float(np.mean(ep_losses)))
        rm_curve["val_ts"].append(ts)
        log(f"  torch RM epoch {ep}: train {rm_curve['train_loss'][-1]:.5f} "
            f"val_ts {ts:.4f}")
    return {"ae": ae_curve, "rm": rm_curve}


# --------------------------------------------------------------------------
# jax arm (the framework's real path)
# --------------------------------------------------------------------------


def run_jax_arm(data_dir, logs_dir, hp, scenes, samples, log):
    from driving_dirty_tpu.models.basic_ae import BasicAE
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2
    from driving_dirty_tpu.train.trainer import Trainer

    data_kw = dict(link=data_dir, samples_per_scene=samples, output_img_freq=0)

    def fit(task, epochs):
        t = Trainer(max_epochs=epochs, default_root_dir=logs_dir,
                    log_every_n_steps=5, enable_progress_bar=False)
        return t.fit(task)

    def series(task_name, key):
        import glob

        paths = sorted(
            glob.glob(os.path.join(logs_dir, task_name, "version_*", "tb",
                                   "metrics.jsonl")),
            key=lambda p: int(p.split("version_")[1].split(os.sep)[0]),
        )
        vals = []
        with open(paths[-1]) as f:
            for line in f:
                rec = json.loads(line)
                if key in rec:
                    vals.append((rec["step"], rec[key]))
        return [v for _, v in sorted(vals)]

    log("  jax AE fit...")
    ae = BasicAE(dict(hidden_dim=hp["hidden_dim"], latent_dim=hp["latent_dim"],
                      batch_size=hp["batch_size"], learning_rate=hp["ae_lr"],
                      precision=32, num_unlabeled_scenes=scenes, **data_kw))
    r = fit(ae, hp["ae_epochs"])
    ae_val = series(ae.name, "val_loss")
    ckpt = r.best_ckpt_path or r.last_ckpt_path

    log("  jax RM fit...")
    rm = RoadMapBCEv2(dict(pretrained_path=ckpt, batch_size=hp["batch_size"],
                           learning_rate=hp["rm_lr"], precision=32,
                           unfreeze_epoch_no=10 ** 6,
                           num_labeled_scenes=scenes, **data_kw))
    fit(rm, hp["rm_epochs"])
    rm_ts = series(rm.name, "val_ts_rounded")
    return {"ae": {"val_mse": ae_val}, "rm": {"val_ts": rm_ts}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/ab_reference_protocol.json")
    ap.add_argument("--data", default="/tmp/dd_ab_data")
    ap.add_argument("--logs", default="/tmp/dd_ab_logs")
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--samples", type=int, default=12)
    ap.add_argument("--ae_epochs", type=int, default=5)
    ap.add_argument("--rm_epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--hidden_dim", type=int, default=32)
    ap.add_argument("--latent_dim", type=int, default=16)
    ap.add_argument("--ae_lr", type=float, default=1e-3)
    ap.add_argument("--rm_lr", type=float, default=1e-2)
    ap.add_argument("--arms", default="torch,jax")
    ap.add_argument("--jax_platform", choices=["cpu", "default"],
                    default="cpu")
    ap.add_argument("--learned_floor", type=float, default=0.03,
                    help="both-arms BEST val TS must exceed this; 0.03 is "
                         "just above the measured NO-transfer baseline "
                         "(random-encoder frozen readout reaches 0.024 on "
                         "this task, artifacts/convergence_gate/"
                         "tpu_gate_summary.json val_ts_random_best) — the "
                         "torch reference itself tops out ~0.05 at the "
                         "gate-scale budget, so the gate-2 band floor "
                         "(0.10) is NOT the right bar for both arms")
    args = ap.parse_args()

    def log(msg):
        print(msg, flush=True)

    # --jax_platform cpu (default) pins the jax arm to the same host CPU the
    # torch arm uses; 'default' leaves platform discovery alone so the jax
    # arm runs on the real TPU (the framework's product path — at gate scale
    # the CPU jax arm takes hours, and the claim under test is
    # distributional task outcome, not numerics-on-identical-silicon; the
    # artifact records the platform per arm).
    if args.jax_platform == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.jax_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.data.synthetic import generate

    enable_compilation_cache()

    if not os.path.isdir(args.data):
        log("generating shared synthetic dataset...")
        generate(args.data, scenes=args.scenes, samples=args.samples,
                 labeled_scenes=args.scenes, seed=0, structured=True,
                 road_from_tint=True, road_noise=(0.2, 0.01))
    hp = dict(hidden_dim=args.hidden_dim, latent_dim=args.latent_dim,
              batch_size=args.batch_size, ae_lr=args.ae_lr, rm_lr=args.rm_lr,
              ae_epochs=args.ae_epochs, rm_epochs=args.rm_epochs)

    result = {"hparams": hp, "seed": SEED,
              "dataset": dict(path=args.data, scenes=args.scenes,
                              samples=args.samples, structured=True,
                              road_from_tint=True, road_noise=[0.2, 0.01]),
              "caveats": "matched protocol/hparams/splits; per-step RNG "
                         "draws (mask indices, init) are framework-local, "
                         "so the claim is distributional, not bitwise"}
    arms = set(args.arms.split(","))

    t0 = time.time()
    if "torch" in arms:
        log("== torch arm (genuine reference modules, hand-driven) ==")
        arrays = load_arrays(args.data, args.scenes, args.samples)
        result["splits"] = arrays["splits"]
        t = time.time()
        result["torch"] = run_torch_arm(arrays, hp, log)
        result["torch"]["wall_seconds"] = time.time() - t
    if "jax" in arms:
        log("== jax arm (framework Trainer path) ==")
        t = time.time()
        result["jax"] = run_jax_arm(args.data, args.logs, hp, args.scenes,
                                    args.samples, log)
        result["jax"]["wall_seconds"] = time.time() - t
        result["jax"]["backend"] = jax.default_backend()

    if "torch" in result and "jax" in result:
        ts_t = result["torch"]["rm"]["val_ts"][-1]
        ts_j = result["jax"]["rm"]["val_ts"][-1]
        best_t = max(result["torch"]["rm"]["val_ts"])
        best_j = max(result["jax"]["rm"]["val_ts"])
        result["verdict"] = {
            "final_val_ts_torch": ts_t, "final_val_ts_jax": ts_j,
            "best_val_ts_torch": best_t, "best_val_ts_jax": best_j,
            "abs_delta_final": abs(ts_t - ts_j),
            "abs_delta_best": abs(best_t - best_j),
            # tolerance: the val sets are small (few scenes) and RNG draws
            # are framework-local; the gate-2 TPU calibration showed frozen
            # linear readouts land 0.10-0.60 depending on draw — a 0.15
            # band on BEST TS separates "same protocol learned the same
            # task comparably" from "one arm failed to learn"
            "tolerance_best": 0.15,
            "learned_floor": args.learned_floor,
            "both_learned": bool(best_t > args.learned_floor
                                 and best_j > args.learned_floor),
            "ok": bool(abs(best_t - best_j) <= 0.15
                       and best_t > args.learned_floor
                       and best_j > args.learned_floor),
        }
    result["wall_seconds"] = time.time() - t0
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    log(json.dumps(result.get("verdict", result), indent=1))


if __name__ == "__main__":
    main()
