#!/bin/bash
# Repo health checks (what the build driver runs, runnable anywhere).
set -e
cd "$(dirname "$0")/.."

echo "== unit + integration tests (virtual 8-device CPU mesh) =="
# full suite; use -m "not slow" for the ~5-minute quick subset
python -m pytest tests/ -x -q

echo "== driver contracts on the virtual mesh =="
PYTHONPATH="$PWD" JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== benchmark (smoke preset; use 'python bench.py' on a TPU) =="
python bench.py --preset smoke
