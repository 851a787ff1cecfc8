#!/usr/bin/env bash
# One-command CI: test suite + native build + driver contracts.
#
# Usage:
#   bash scripts/ci.sh          # full tier: everything (incl. the ~15-min
#                               # DRYRUN_FULL multichip sweep via pytest)
#   bash scripts/ci.sh --fast   # fast tier: pytest -m 'not slow' only;
#                               # skips the multichip dryrun, wheel build,
#                               # and native-toolchain tests (target <6 min)
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=0
if [[ "${1:-}" == "--fast" ]]; then FAST=1; fi

if [[ "$FAST" == "1" ]]; then
  echo "== fast tier: test suite minus slow markers =="
  python -m pytest tests/ -x -q -m "not slow"
  echo "CI OK (fast tier)"
  exit 0
fi

echo "== native host ops build =="
python -m sam2unet_tpu.ops.build_native

echo "== test suite (8 virtual CPU devices; incl. DRYRUN_FULL dryrun) =="
python -m pytest tests/ -x -q

echo "== driver entry compile check =="
JAX_PLATFORMS=cpu python __graft_entry__.py

echo "== multi-chip dryrun, driver scope (3 cheap phases, per-phase prints) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "CI OK"
