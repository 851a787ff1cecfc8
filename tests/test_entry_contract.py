"""Driver contract: __graft_entry__ and bench.py stay importable/tracable."""

import subprocess
import sys


def test_entry_traces():
    import jax

    import __graft_entry__ as g

    fn, (variables, x) = g.entry()
    # trace-only check (compile is exercised on real hardware by the driver)
    out = jax.eval_shape(fn, variables, x)
    assert [o.shape for o in out] == [(1, 352, 352, 1)] * 3


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_help_runs():
    r = subprocess.run(
        [sys.executable, "bench.py", "--help"], capture_output=True, text=True
    )
    assert r.returncode == 0
    assert "--mode" in r.stdout
