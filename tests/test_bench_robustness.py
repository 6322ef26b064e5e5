"""Fault-injection tests of bench.py's failure paths (VERDICT r4 item 6).

The driver runs bench.py unattended on a tunneled TPU that wedges for hours;
these tests force each failure mode via the DD_BENCH_FAULT hook and assert
the contract: a PARSEABLE headline JSON line always reaches stdout and the
exit code is the documented one (2 for infrastructure failure). Runs in a
subprocess (bench.py os._exit's by design) on CPU — the faults fire before
any device work.
"""
import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _run(fault, extra=(), timeout=120):
    env = dict(os.environ, DD_BENCH_FAULT=fault, DD_BENCH_CPU="1")
    p = subprocess.run(
        [sys.executable, BENCH, "--probe_timeout", "60" if fault != "probe_hang" else "1",
         "--probe_attempts", "2", "--zoo", "0", *extra],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(BENCH),
    )
    return p


def _headline(stdout):
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            if rec.get("metric", "").startswith("6-view"):
                return rec
    raise AssertionError(f"no headline JSON on stdout: {stdout!r}")


def test_probe_hang_exits_2_with_parseable_line():
    p = _run("probe_hang")
    assert p.returncode == 2, p.stderr[-2000:]
    rec = _headline(p.stdout)
    assert rec["value"] is None
    assert "probe timed out" in rec["error"]
    # the bounded retry actually happened
    assert "attempt 1/2" in p.stderr


def test_headline_fault_degrades_then_fails_structured():
    """Injected headline failure also fails the degraded retry -> structured
    error line + rc 2 (never a silent hang or an unparseable crash)."""
    p = _run("headline_fail", timeout=600)
    assert p.returncode == 2, p.stderr[-2000:]
    rec = _headline(p.stdout)
    assert rec["value"] is None
    assert "degraded" in rec["error"]
    # the degraded retry was attempted before giving up
    assert "retrying at degraded size" in p.stderr


@pytest.mark.heavy
def test_no_fault_cpu_headline_parses():
    """Sanity: with no fault injected the bench still emits a parseable
    headline on this host (CPU backend; tiny batch to keep it quick)."""
    p = _run("", extra=("--batch", "4", "--iters", "2"), timeout=900)
    rec = _headline(p.stdout)
    assert p.returncode == 0
    assert rec["value"] is None or rec["value"] > 0
