#!/usr/bin/env bash
# One-command CI: test suite + native build + driver contracts.
# Usage: bash scripts/ci.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native host ops build =="
python -m sam2unet_tpu.ops.build_native

echo "== test suite (8 virtual CPU devices) =="
python -m pytest tests/ -x -q

echo "== driver entry compile check =="
JAX_PLATFORMS=cpu python __graft_entry__.py

echo "== multi-chip dryrun (8 virtual devices, dp + dp x tp) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "CI OK"
