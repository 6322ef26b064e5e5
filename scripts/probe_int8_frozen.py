"""A/B: int8 conv trunk during the FROZEN-encoder fine-tune phase.

Every fine-tune's first `unfreeze_epoch_no` epochs run the trunk
forward-only under stop_gradient — the +35% static-scale int8 trunk
(ops/quant.py) is numerically legal there because no gradient flows through
the quantized convs. This probe times the full frozen-phase train step
(value_and_grad over the HEAD only, encoder stop-gradient'ed) for the
roadmap fine-tune at reference scale, bf16 trunk vs int8 trunk.

MUST run on real TPU (int8 MXU rate is the whole point).

    python scripts/probe_int8_frozen.py [--batch 128] [--iters 20]

If int8 wins, wire --precision 8 training to quantize the trunk during
frozen epochs; if it loses, record the negative result (README perf notes).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from driving_dirty_tpu.cli.common import enable_compilation_cache
    from driving_dirty_tpu.models.roadmap import RoadMapBCEv2
    from driving_dirty_tpu.ops import quant
    from driving_dirty_tpu.ops.stitch import normalize_images, wide_stitch

    enable_compilation_cache()
    b = args.batch
    task = RoadMapBCEv2(dict(pretrained_path=None, ae_hidden_dim=128,
                             ae_latent_dim=64, batch_size=b, precision=16))
    params, state = task.init(jax.random.PRNGKey(0))
    rng0 = np.random.RandomState(0)
    images = jnp.asarray(rng0.rand(b, 6, 256, 306, 3).astype(np.float32))
    road = jnp.asarray((rng0.rand(b, 800, 800) > 0.5).astype(np.float32))
    batch = {"images": images, "road": road}
    tx = optax.adam(1e-4)

    # static int8 scales, calibrated eagerly (quant.py: dynamic absmax loses)
    pano = wide_stitch(normalize_images(images[:8], task.compute_dtype))
    scales = quant.calibrate_trunk(params["encoder"], pano)

    def make_step(int8):
        head_params = {k: v for k, v in params.items() if k != "encoder"}
        opt_state = tx.init(head_params)

        # frozen phase: encoder params enter under stop_gradient so grads
        # flow only to the head — mirrors the trainer's static freeze
        # partition. Everything big (batch, encoder params) is a traced
        # ARGUMENT: closing over device arrays bakes them into the HLO as
        # constants, and a ~250 MB constant-laden program takes tens of
        # minutes to ship through the tunnel's compile RPC (observed).
        # The int8 arm overrides the mixin gate that normally reserves
        # int8 for inference.
        if int8:
            task.enc_int8_kwargs = lambda train: {"int8": True, "int8_scales": scales}
        else:
            task.enc_int8_kwargs = lambda train: {"int8": False, "int8_scales": None}

        @jax.jit
        def step(hp_, enc_p, o, s, bt, rng):
            def lf(hp_):
                p = {"encoder": jax.lax.stop_gradient(enc_p), **hp_}
                loss, (ns, _) = task.loss(p, s, bt, rng, train=True)
                return loss, ns

            (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(hp_)
            u, o = tx.update(g, o, hp_)
            return optax.apply_updates(hp_, u), o, ns, loss

        return step, head_params, opt_state

    results = {}
    for name, int8 in (("bf16 trunk", False), ("int8 trunk", True)):
        print(f"compiling {name} step (batch {b})...", flush=True)
        step, hp_, opt = make_step(int8)
        s = state
        rng = jax.random.PRNGKey(1)
        t_c = time.perf_counter()
        for _ in range(args.warmup):
            hp_, opt, s, loss = step(hp_, params["encoder"], opt, s, batch, rng)
        float(loss)
        print(f"  compiled+warm in {time.perf_counter() - t_c:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            hp_, opt, s, loss = step(hp_, params["encoder"], opt, s, batch, rng)
            float(loss)  # per-step host sync: honest timing on axon
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"{name}: {dt*1e3:8.2f} ms/step ({b/dt:7.1f} scenes/s), "
              f"final loss {float(loss):.4f}", flush=True)

    speedup = results["bf16 trunk"] / results["int8 trunk"]
    print(f"int8 frozen-phase speedup: {speedup:.2f}x "
          f"({'WIN — wire into --precision 8 frozen epochs' if speedup > 1.05 else 'no win — document negative result'})",
          flush=True)


if __name__ == "__main__":
    main()
