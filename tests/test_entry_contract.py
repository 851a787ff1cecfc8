"""Driver contract: __graft_entry__ and bench.py stay importable/tracable."""

import subprocess
import sys

import pytest


def test_entry_traces():
    import jax

    import __graft_entry__ as g

    fn, (variables, x) = g.entry()
    # trace-only check (compile is exercised on real hardware by the driver)
    out = jax.eval_shape(fn, variables, x)
    assert [o.shape for o in out] == [(1, 352, 352, 1)] * 3


@pytest.mark.slow
def test_dryrun_multichip_8(monkeypatch):
    """Full phase set (DRYRUN_FULL=1): the driver itself only runs the
    cheap 3-phase default (post-MULTICHIP_r03 contract hardening); the
    heavy hiera_l@256 shard_map and ring-attention SP phases are exercised
    here instead, with no wall-clock skip so every phase really runs."""
    monkeypatch.setenv("DRYRUN_FULL", "1")
    monkeypatch.setenv("DRYRUN_BUDGET_S", "100000")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_help_runs():
    r = subprocess.run(
        [sys.executable, "bench.py", "--help"], capture_output=True, text=True
    )
    assert r.returncode == 0
    assert "--mode" in r.stdout


def test_bench_init_watchdog_emits_error_json_and_exits():
    """A wedged TPU tunnel hangs the first backend touch forever; the
    watchdog must turn that into one parseable JSON line + exit code 3 so
    the driver's round-end bench never stalls. Simulated by arming the
    watchdog and sleeping past it."""
    import json

    code = (
        "import time, bench\n"
        "bench._start_init_watchdog(0.2, 'm')\n"
        "time.sleep(10)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60, cwd=".",
    )
    assert r.returncode == 3
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "m" and rec["value"] == 0.0
    assert "error" in rec and "init" in rec["error"]
