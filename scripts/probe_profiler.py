"""Verify (or re-verify) the jax.profiler claim on the axon TPU platform.

The trainer disables --profile_dir on axon because start_trace was observed
to hang (train/trainer.py). VERDICT r2 item 7 asks that the hang be OBSERVED
under a watchdog rather than assumed: this script runs the minimal
start_trace -> compiled work -> stop_trace sequence in a SUBPROCESS with a
hard timeout, so a hang is reported (and killed) instead of freezing the
caller, and a success leaves a real trace artifact.

    python scripts/probe_profiler.py [--timeout 120] [--out /tmp/jax_trace]

Exit: prints a one-line verdict; artifacts land in --out on success.
"""
import argparse
import datetime
import os
import subprocess
import sys

CHILD = r"""
import sys
import jax, jax.numpy as jnp

out = sys.argv[1]
print("devices:", jax.devices(), flush=True)
x = jnp.ones((512, 512))
float((x @ x).sum())  # warm compile BEFORE tracing
print("starting trace", flush=True)
jax.profiler.start_trace(out)
print("trace started", flush=True)
for _ in range(5):
    x = x @ x / 512.0
float(x.sum())
jax.profiler.stop_trace()
print("trace stopped", flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=120)
    ap.add_argument("--out", default="/tmp/jax_trace_probe")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD, args.out],
            timeout=args.timeout, capture_output=True, text=True,
        )
        ok = r.returncode == 0 and "trace stopped" in r.stdout
        print(r.stdout)
        if r.stderr.strip():
            print(r.stderr[-2000:], file=sys.stderr)
        if ok:
            files = []
            for root, _, names in os.walk(args.out):
                files += [os.path.join(root, n) for n in names]
            print(f"VERDICT: profiler WORKS on this platform "
                  f"({len(files)} trace files under {args.out}) — "
                  f"re-enable --profile_dir for it. {datetime.date.today()}")
        else:
            print(f"VERDICT: profiler child exited rc={r.returncode} without "
                  f"completing — keep the disable. {datetime.date.today()}")
    except subprocess.TimeoutExpired as e:
        print((e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or ""))
        print(f"VERDICT: profiler HUNG (> {args.timeout}s, killed by watchdog) "
              f"— the trainer's axon disable stands re-verified. "
              f"{datetime.date.today()}")


if __name__ == "__main__":
    main()
