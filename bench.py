"""Benchmark: 6-view scenes/sec/chip on roadmap inference (BASELINE.json
config 1 / north-star metric).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against the PyTorch-CPU reference pipeline measured on
this machine (the reference publishes no throughput numbers — SURVEY.md §6).
The baseline is measured once and cached in BASELINE_SELF.json; pass
--rebaseline to re-measure.

Model: flagship roadmap inference at reference scale (AE hidden 128, latent 64
per FinalReport §2; stitch -> conv encoder -> 940032x128 dense -> latent ->
640000-way head -> sigmoid mask). Random weights — throughput does not depend
on weight values.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_SELF.json")
HID, LAT = 128, 64
BATCH = 256  # bf16 sweet spot: 3145 scenes/s vs 2859 at 128; 192 regresses (2408)
BATCH_INT8 = 512  # int8 sweet spot: 3374 scenes/s (vs 3340 at 256)
H, W = 256, 306


def log(*a):
    print(*a, file=sys.stderr)


# Per-chip peak for the bench hardware (TPU v5e / v5 lite): 197 TFLOP/s
# bf16, 394 TOP/s int8 (public v5e spec). mfu_vs_peak divides the measured
# effective rate by the matching peak — the judgeable hardware-ceiling view
# VERDICT r3 item 8 asks for next to the CPU-relative vs_baseline. v5e has
# no published native-fp32 MXU rate (f32 matmuls run through the bf16 MXU
# with passes), so precision-32 runs carry no mfu_vs_peak (ADVICE r4).
V5E_PEAK_FLOPS = {8: 394e12, 16: 197e12}


def _compiled_flops(jitted, *args):
    """FLOPs of one execution from XLA's compiled-HLO cost analysis (same
    counters the trainer logs at trainer.py _log_cost_analysis). Returns
    None when the backend offers no analysis."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — diagnostics only
        log(f"cost_analysis unavailable: {e}")
        return None


def measure_tpu(batch=BATCH, iters=20, warmup=3, precision=16, fast_conv=False, fast_head=False, fused_trunk=None):
    import jax
    import jax.numpy as jnp

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    enable_compilation_cache()
    task = RoadMapBCEv2(
        dict(pretrained_path=None, ae_hidden_dim=HID, ae_latent_dim=LAT,
             precision=precision, fast_conv=fast_conv, fast_head=fast_head,
             fused_trunk=fused_trunk)
    )
    params, state = task.init(jax.random.PRNGKey(0))
    if precision == 8:
        # static activation-scale calibration must precede tracing
        task.calibrate_int8(
            params, state,
            np.random.RandomState(0).rand(8, 6, H, W, 3).astype(np.float32))

    @jax.jit
    def predict(params, state, images):
        logits, _, _ = task.forward(params, state, images, train=False, rng=jax.random.PRNGKey(0))
        mask = logits > 0  # == sigmoid > 0.5
        # scalar digest fetched host-side: forces real completion per batch
        # (block_until_ready is unreliable on the tunneled platform)
        return mask, jnp.sum(mask)

    x = jnp.asarray(np.random.RandomState(0).rand(batch, 6, H, W, 3).astype(np.float32))
    for _ in range(warmup):
        float(predict(params, state, x)[1])
    # Double-buffered consumer: keep a small pipeline of dispatched batches in
    # flight, but *every* output is synced to host — honest throughput.
    inflight = []
    depth = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        inflight.append(predict(params, state, x)[1])
        if len(inflight) > depth:
            float(inflight.pop(0))
    for d in inflight:
        float(d)
    dt = time.perf_counter() - t0
    sps = batch * iters / dt
    log(f"tpu[p{precision}]: {sps:.2f} scenes/s ({iters}x batch {batch} in {dt:.2f}s) on {jax.devices()[0]}")
    flops = _compiled_flops(predict, params, state, x)
    return sps, flops


def measure_torch_cpu(batch=4, iters=3):
    """Reference-equivalent inference in torch on CPU (the reference's only
    exercised config is single-device; CPU is the comparable host baseline).
    Architecture mirrors /root/reference encoder + roadmap head at the same
    dims; built fresh here purely as a measurement rig."""
    import torch
    import torch.nn.functional as F

    torch.set_num_threads(os.cpu_count() or 8)

    class Enc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(3, 32, 3, padding=1)
            self.c2 = torch.nn.Conv2d(32, 32, 3, padding=1)
            self.c3 = torch.nn.Conv2d(32, 32, 3, 2, 1)
            cod = (32 * 128 * 918) // 4
            self.fc1 = torch.nn.Linear(cod, HID)
            self.bn1 = torch.nn.BatchNorm1d(HID)
            self.fc2 = torch.nn.Linear(HID, HID)
            self.bn2 = torch.nn.BatchNorm1d(HID)
            self.fcz = torch.nn.Linear(HID, LAT)
            self.head = torch.nn.Linear(LAT, 800 * 800)

        def forward(self, x):
            x = F.relu(self.c1(x))
            x = F.relu(self.c2(x))
            x = F.relu(self.c3(x))
            x = x.reshape(x.size(0), -1).unsqueeze(1)
            x = F.max_pool1d(x, 4).squeeze(1)
            x = F.relu(self.bn1(self.fc1(x)))
            x = F.relu(self.bn2(self.fc2(x)))
            z = self.fcz(x)
            y = torch.sigmoid(self.head(z)).reshape(-1, 800, 800)
            return y > 0.5

    model = Enc().eval()
    x = torch.rand(batch, 6, 3, H, W)
    with torch.no_grad():
        # stitch: reorder + permute + reshape as the reference does
        def run(x):
            p = x[:, [0, 1, 2, 5, 4, 3]]
            b, v, c, h, w = p.shape
            wide = p.permute(0, 2, 3, 1, 4).reshape(b, c, h, v * w)
            return model(wide)

        run(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            run(x)
        dt = time.perf_counter() - t0
    sps = batch * iters / dt
    log(f"torch-cpu baseline: {sps:.2f} scenes/s ({iters}x batch {batch} in {dt:.2f}s)")
    return sps


def _pipelined(f, args_, iters, depth=4, warmup=2):
    for _ in range(warmup):
        float(f(*args_)[1])
    inflight = []
    t0 = time.perf_counter()
    for _ in range(iters):
        inflight.append(f(*args_)[1])
        if len(inflight) > depth:
            float(inflight.pop(0))
    for d in inflight:
        float(d)
    return (time.perf_counter() - t0) / iters


def measure_zoo(eval_batch=64, train_batch=16, iters=8):
    """Whole-zoo throughput rows for the driver-captured artifact
    (VERDICT r3 item 5: the README's zoo numbers came from builder-side
    scripts/bench_all.py + probe_*.py runs; emitting them from bench.py gives
    them the same rc=0 verification as the headline). Eval rows mirror
    scripts/bench_all.py; train rows mirror scripts/probe_train.py. Every row
    is independent: one family failing records an error without killing the
    headline result."""
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.RandomState(0)
    rows = []

    def eval_row(name, fn, args_, batch):
        try:
            f = jax.jit(fn)
            dt = _pipelined(f, args_, iters)
            rows.append({"name": name, "mode": "eval", "batch": batch,
                         "scenes_per_sec": round(batch / dt, 1),
                         "ms_per_batch": round(dt * 1e3, 2)})
            log(f"zoo {name:18s} eval : {batch/dt:8.1f} scenes/s")
        except Exception as e:  # noqa: BLE001
            rows.append({"name": name, "mode": "eval", "error": str(e)[:300]})

    def train_row(name, task, batch, lr=1e-3):
        try:
            params, state = task.init(jax.random.PRNGKey(0))
            tx = optax.adam(lr)
            opt_state = tx.init(params)

            @jax.jit
            def step(params, opt_state, state, b, rng_):
                def loss_fn(p):
                    loss, (ns, _aux) = task.loss(p, state, b, rng_, train=True)
                    return loss, ns
                (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state2, ns, loss

            keys = jax.random.split(jax.random.PRNGKey(1), iters + 2)
            for i in range(2):
                params, opt_state, state, loss = step(params, opt_state, state, batch, keys[i])
            float(loss)
            t0 = time.perf_counter()
            for i in range(iters):
                params, opt_state, state, loss = step(params, opt_state, state, batch, keys[2 + i])
            float(loss)
            dt = (time.perf_counter() - t0) / iters
            bs = jax.tree.leaves(batch)[0].shape[0]
            rows.append({"name": name, "mode": "train", "batch": bs,
                         "scenes_per_sec": round(bs / dt, 1),
                         "ms_per_step": round(dt * 1e3, 2)})
            log(f"zoo {name:18s} train: {bs/dt:8.1f} scenes/s")
        except Exception as e:  # noqa: BLE001
            rows.append({"name": name, "mode": "train", "error": str(e)[:300]})

    B = eval_batch
    images = jnp.asarray(rng.randint(0, 256, (B, 6, H, W, 3), np.uint8))
    road = jnp.asarray((rng.rand(B, 800, 800) > 0.5).astype(np.float32))
    common = dict(pretrained_path=None, ae_hidden_dim=HID, ae_latent_dim=LAT,
                  precision=16, batch_size=B)
    key0 = jax.random.PRNGKey(0)

    from driving_dirty_tpu.models.basic_ae import BasicAE

    ae = BasicAE(dict(hidden_dim=HID, latent_dim=LAT, precision=16, batch_size=B))
    pa, sa = ae.init(key0)
    eval_row("basic_ae", lambda p, s, x: (lambda yh: (yh, jnp.sum(yh[:, ::64, ::64, :].astype(jnp.float32))))(
        ae.forward(p, s, x, train=False, rng=key0)[0]), (pa, sa, images), B)

    from driving_dirty_tpu.models.spatial_bb import BBSpatialRoadMap

    sp = BBSpatialRoadMap(common)
    ps, ss = sp.init(key0)
    eval_row("spatial_rm", lambda p, s, x, r: (lambda pr: (pr, jnp.sum(pr[:, ::64, ::64].astype(jnp.float32))))(
        sp.forward(p, s, x, r, train=False, rng=key0)[0]), (ps, ss, images, road), B)

    from driving_dirty_tpu.models.multitask import MultiTask

    mt = MultiTask(common)
    pm, sm = mt.init(key0)

    def mt_fn(p, s, x):
        rm, box, _ = mt.forward(p, s, x, train=False, rng=key0)
        return rm, jnp.sum((rm > 0).astype(jnp.float32)[:, ::64, ::64]) + jnp.sum(box[:, ::64, ::64])

    eval_row("multitask", mt_fn, (pm, sm, images), B)

    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    fr = FasterRCNNRoadMap(common)
    pf, sf = fr.init(key0)

    def fr_fn(p, s, x, r):
        dets = fr.predict(p, s, x, r)
        leaf = jax.tree.leaves(dets)[0]
        return dets, jnp.sum(leaf.astype(jnp.float32))

    eval_row("faster_rcnn_rm", fr_fn, (pf, sf, images, road), B)

    # training throughput (compiled step on device-resident data)
    tb = train_batch
    t_images = jnp.asarray(rng.randint(0, 256, (tb * 2, 6, H, W, 3), np.uint8))
    t_road = jnp.asarray((rng.rand(tb * 2, 800, 800) > 0.5).astype(np.float32))
    boxes = np.zeros((tb, 16, 2, 4), np.float32)
    boxes[:, :, 0] = [[5, 5, -5, -5]]
    boxes[:, :, 1] = [[5, -5, 5, -5]]
    bvalid = np.zeros((tb, 16), bool)
    bvalid[:, :3] = True
    cats = np.full((tb, 16), 2, np.int32)

    ae_t = BasicAE(dict(hidden_dim=HID, latent_dim=LAT, precision=16, batch_size=tb * 2))
    train_row("basic_ae", ae_t, {"images": t_images})
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

    rm_t = RoadMapBCEv2(dict(pretrained_path=None, ae_hidden_dim=HID,
                             ae_latent_dim=LAT, precision=16,
                             unfreeze_epoch_no=0, batch_size=tb * 2))
    train_row("roadmap_bce", rm_t, {"images": t_images, "road": t_road[: tb * 2]})
    fr_t = FasterRCNNRoadMap(dict(common, batch_size=tb, max_bb=16))
    train_row("faster_rcnn_rm", fr_t,
              {"images": t_images[:tb], "road": t_road[:tb],
               "boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(bvalid),
               "categories": jnp.asarray(cats)})
    sp_t = BBSpatialRoadMap(dict(common, batch_size=tb, unfreeze_epoch_no=0))
    sp_t.current_epoch = 0
    train_row("spatial_rm", sp_t,
              {"images": t_images[:tb], "road": t_road[:tb],
               "boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(bvalid)})
    mt_t = MultiTask(dict(common, batch_size=tb, unfreeze_epoch_no=0))
    mt_t.current_epoch = 0
    train_row("multitask", mt_t,
              {"images": t_images[:tb], "road": t_road[:tb],
               "boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(bvalid)})
    return rows


def get_baseline(rebaseline=False):
    if not rebaseline and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_scenes_per_sec"]
    sps = measure_torch_cpu()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_scenes_per_sec": sps, "measured_at": time.time()}, f)
    return sps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebaseline", action="store_true")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 512 for int8, 256 for bf16/f32 (measured optima)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--precision", type=int, default=8, choices=[8, 16, 32],
                    help="8 (default) = int8-quantized conv trunk with static "
                         "calibrated scales (inference-only, ops/quant.py; >99%% "
                         "mask agreement vs float). 16 = bf16 (3145 scenes/s).")
    ap.add_argument("--fast_conv", type=int, default=0, choices=[0, 1],
                    help="blocked space-to-depth encoder convs (ops/fastconv.py)")
    ap.add_argument("--fast_head", type=int, default=0, choices=[0, 1],
                    help="transpose-free latent head (NHWC pool + folded dot_general)")
    ap.add_argument("--fused_trunk", type=int, default=None, choices=[0, 1],
                    help="fused Pallas conv-trunk kernel (pallas/trunk.py); measured slower, default off")
    ap.add_argument("--zoo", type=int, default=1, choices=[0, 1],
                    help="after the headline line, measure the whole model "
                         "zoo (eval + train) and print a second JSON line "
                         "{\"zoo\": [...]} for the driver artifact")
    ap.add_argument("--probe_timeout", type=float, default=120,
                    help="seconds per device-liveness probe attempt")
    ap.add_argument("--probe_attempts", type=int, default=3,
                    help="probe attempts; backoff 30s * attempt between them")
    ap.add_argument("--deadline", type=float, default=1800,
                    help="watchdog: if no headline line has been printed "
                         "after this many seconds (tunnel wedged MID-run, "
                         "after a passing probe), emit a structured error "
                         "line and exit 2 instead of hanging the caller; "
                         "0 disables")
    args = ap.parse_args(argv)
    # fault injection for the robustness tests (tests/test_bench_robustness):
    #   probe_hang    — the liveness probe never completes
    #   headline_fail — the full-size measurement raises
    fault = os.environ.get("DD_BENCH_FAULT", "")
    if os.environ.get("DD_BENCH_CPU"):
        # hermetic-test mode: the ambient axon plugin ignores
        # JAX_PLATFORMS=cpu from the environment, so force it in-process
        import jax

        jax.config.update("jax_platforms", "cpu")

    def fail_line(err, rc=2):
        """STRUCTURED failure: the JSON line still prints (value=null +
        error) so the driver records a parseable result; leave via os._exit
        — a wedged axon client thread throws during normal interpreter
        teardown, turning a clean sys.exit into SIGABRT (BENCH_r02 rc=134)."""
        print(json.dumps({
            "metric": "6-view scenes/sec/chip (roadmap inference)",
            "value": None, "unit": "scenes/sec", "vs_baseline": None,
            "error": err,
        }))
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)

    # fail fast if the device/tunnel is wedged: a trivial op that does not
    # answer within the probe window means the heavy run would hang the caller
    # for its whole timeout budget (observed multi-hour tunnel outages).
    # Bounded multi-retry with linear backoff (VERDICT r4 item 6) — r4's
    # headline survived only because of the single retry.
    import threading

    probe_ok = threading.Event()

    def _probe():
        if fault == "probe_hang":
            return  # simulate a wedged tunnel: never set the event
        import jax
        import jax.numpy as jnp

        float(jnp.ones((8, 8)).sum())
        probe_ok.set()

    for attempt in range(1, max(1, args.probe_attempts) + 1):
        t = threading.Thread(target=_probe, daemon=True)
        t.start()
        t.join(args.probe_timeout)
        if probe_ok.is_set():
            break
        if attempt < args.probe_attempts:
            backoff = 30 * attempt if fault == "" else 0.1
            sys.stderr.write(
                f"bench.py: device liveness probe timed out "
                f"({args.probe_timeout:.0f} s, attempt {attempt}/"
                f"{args.probe_attempts}); retrying in {backoff:.0f} s\n"
            )
            time.sleep(backoff)
    if not probe_ok.is_set():
        sys.stderr.write(
            "bench.py: device liveness probe did not complete "
            f"(x{args.probe_attempts}; TPU tunnel down or wedged); "
            "aborting instead of hanging\n"
        )
        fail_line(
            f"TPU tunnel down: device liveness probe timed out "
            f"({args.probe_timeout:.0f} s x{args.probe_attempts})"
        )

    # watchdog: a probe can pass and the tunnel wedge DURING the heavy
    # measurement; without this the driver sees a silent hang + rc!=0
    headline_done = threading.Event()
    if args.deadline > 0:
        def _watchdog():
            if not headline_done.wait(args.deadline):
                sys.stderr.write(
                    f"bench.py: no headline after {args.deadline:.0f} s "
                    "(tunnel wedged mid-run); emitting structured error\n"
                )
                fail_line(f"measurement exceeded {args.deadline:.0f}s deadline")

        threading.Thread(target=_watchdog, daemon=True).start()

    baseline = get_baseline(args.rebaseline)
    if args.batch is None:
        args.batch = BATCH_INT8 if args.precision == 8 else BATCH
    degraded = False
    try:
        if fault == "headline_fail":
            raise RuntimeError("injected headline fault")
        sps, flops = measure_tpu(args.batch, args.iters, precision=args.precision,
                                 fast_conv=bool(args.fast_conv), fast_head=bool(args.fast_head),
                                 fused_trunk=args.fused_trunk)
    except Exception as e:  # noqa: BLE001 — degrade, don't die
        # partial result beats rc!=0 (VERDICT r4 item 6): retry once at the
        # cheapest possible configuration so the driver still gets a number
        sys.stderr.write(f"bench.py: full-size measurement failed ({e}); "
                         "retrying at degraded size (batch 32, 5 iters)\n")
        try:
            if fault == "headline_fail":
                raise RuntimeError("injected headline fault (degraded)")
            sps, flops = measure_tpu(32, 5, warmup=1, precision=args.precision)
            degraded = True
        except Exception as e2:  # noqa: BLE001
            fail_line(f"measurement failed at full AND degraded size: {e2}")
    line = {
        "metric": "6-view scenes/sec/chip (roadmap inference)",
        "value": round(sps, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(sps / baseline, 2) if baseline else None,
    }
    if degraded:
        line["degraded"] = True
    if flops:
        # hardware-ceiling view (VERDICT r3 item 8): XLA's compiled-HLO flop
        # count for one batch, the achieved FLOP rate, and the fraction of
        # the chip's matching peak (v5e: 197 TF/s bf16 / 394 TOP/s int8)
        eff = flops * sps / args.batch
        line["model_flops"] = flops
        line["effective_tflops"] = round(eff / 1e12, 2)
        if args.precision in V5E_PEAK_FLOPS:
            line["mfu_vs_peak"] = round(eff / V5E_PEAK_FLOPS[args.precision], 4)
    # headline FIRST: if a later zoo row hangs/crashes, the driver still has
    # the primary measurement on stdout
    print(json.dumps(line))
    headline_done.set()  # disarm the watchdog
    sys.stdout.flush()
    if args.zoo:
        rows = measure_zoo()
        print(json.dumps({"zoo": rows}))
    # exit without running interpreter teardown: the tunneled platform's
    # client threads can throw during finalization and flip rc to SIGABRT
    # even after a fully successful measurement
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
