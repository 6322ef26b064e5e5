"""Summarize a jax.profiler trace: top ops by total device time.

Parses the Chrome-trace JSON (`**/vm.trace.json.gz`) that
`jax.profiler.start_trace` writes — no TensorBoard needed — and prints the
top-N ops by summed duration, grouped by a normalized op name (fusion
indices and unique ids stripped), so repeated kernels aggregate.

    python scripts/trace_top_ops.py /tmp/trace_dir [-n 25] [--pid-filter tpu]

Pair with any probe: run compiled steps between start_trace/stop_trace,
then point this at the trace dir to see where the time goes.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def normalize(name: str) -> str:
    n = re.sub(r"\.\d+", "", name)          # fusion.123 -> fusion
    n = re.sub(r"_\d+$", "", n)
    n = re.sub(r"\d{4,}", "N", n)           # big literal ids
    return n


def load_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("-n", type=int, default=25)
    ap.add_argument("--pid-filter", default=None,
                    help="only count events whose process name contains this "
                         "(e.g. 'TPU' to exclude host threads)")
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    # pid -> process name (from metadata events)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")

    total = collections.Counter()
    count = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if args.pid_filter and args.pid_filter.lower() not in pname.lower():
            continue
        key = normalize(e.get("name", "?"))
        total[key] += e["dur"]
        count[key] += 1
        wall += e["dur"]

    print(f"trace: {path}")
    print(f"processes: {sorted(set(pid_names.values()))}")
    print(f"{'op':48s} {'total ms':>10s} {'calls':>7s} {'share':>7s}")
    for name, dur in total.most_common(args.n):
        print(f"{name[:48]:48s} {dur/1e3:10.2f} {count[name]:7d} {dur/wall:7.1%}")


if __name__ == "__main__":
    main()
