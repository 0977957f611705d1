#!/usr/bin/env bash
# Full validation: test suite (split to fit shell timeouts), driver contract,
# quick bench. Run from the repo root. ~12 min on this machine.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== suite half A ==="
python -m pytest \
  tests/test_transforms.py tests/test_cameras.py tests/test_rasterizer.py \
  tests/test_soft.py tests/test_ops.py tests/test_points.py \
  tests/test_canny.py tests/test_ply.py tests/test_native.py \
  tests/test_utils.py tests/test_fixtures.py tests/test_component_parity.py \
  tests/test_binned_raster.py tests/test_creator.py \
  tests/test_textured_obj.py tests/test_plotting.py \
  tests/test_oracle_raytrace.py tests/test_reference_assets.py -q

echo "=== suite half B ==="
python -m pytest \
  tests/test_pose_fit.py tests/test_parallel.py tests/test_graft_entry.py \
  tests/test_deform.py tests/test_datagen.py tests/test_deform_color.py \
  tests/test_pose_search.py tests/test_pallas_soft.py \
  tests/test_pallas_hard.py tests/test_pallas_gather.py \
  tests/test_torch_parity.py -q

echo "=== driver contract ==="
python __graft_entry__.py

echo "=== bench (quick) ==="
python bench.py --quick

echo "ALL CHECKS PASSED"
