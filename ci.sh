#!/usr/bin/env bash
# Canonical CI for forma-tpu, mirroring the reference's check/test workflow
# (`/root/reference/.github/workflows/ci.yml`).  Runs entirely on host CPU:
# the test conftest forces JAX_PLATFORMS=cpu with an 8-device virtual mesh
# (the same trick the reference plays with software Vulkan).
set -euo pipefail
cd "$(dirname "$0")"

echo "== compile check =="
python -m compileall -q forma_tpu tests tools bench.py __graft_entry__.py

echo "== unit + golden + differential tests =="
python -m pytest tests/ -x -q

echo "== bench smoke (tiny scene, CPU) =="
# --scene pins ONE config: the no-scene default runs the whole BASELINE.md
# suite at 1080p/4K, which is a TPU workload, not a CPU smoke test.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python bench.py \
    --scene paris --frames 2 --paths 500 --width 256 --height 256 --no-verify

echo "== driver entry compile check =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python __graft_entry__.py

echo "CI OK"
