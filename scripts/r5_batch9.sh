#!/bin/bash
# Round-5 batch 9: group-dot silicon A/B + correctness on hardware.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== spmm_window TPU test, group_dot ($(date +%H:%M:%S))"
WGTPU_TEST_TPU=1 WGTPU_SPMM_GROUP_DOT=1 timeout 1500 python -m pytest \
  tests/test_pallas_tpu.py -k "spmm_window or gat_windowed" -q 2>&1 | tail -3
echo "=== spmm_clustered group_dot=1 ($(date +%H:%M:%S))"
WGTPU_SPMM_GROUP_DOT=1 timeout 1500 python bench.py --metric spmm_clustered 2>/dev/null | tail -1
echo "=== spmm_sampled group_dot=1 ($(date +%H:%M:%S))"
WGTPU_SPMM_GROUP_DOT=1 timeout 1500 python bench.py --metric spmm_sampled 2>/dev/null | tail -1
echo "=== gat_layer group_dot=1 ($(date +%H:%M:%S))"
WGTPU_SPMM_GROUP_DOT=1 timeout 1500 python bench.py --metric gat_layer 2>/dev/null | tail -1
echo "=== batch9 done ($(date +%H:%M:%S))"
echo "=== exp_spmm_matrix ($(date +%H:%M:%S))"
timeout 3000 python scripts/exp_spmm_matrix.py 2>&1 | tail -24
echo "=== gat_layer RTT-corrected ($(date +%H:%M:%S))"
timeout 1500 python bench.py --metric gat_layer 2>/dev/null | tail -1
echo "=== gat_layer_xla RTT-corrected ($(date +%H:%M:%S))"
timeout 1500 python bench.py --metric gat_layer --gat-xla 2>/dev/null | tail -1
echo "=== batch9b done ($(date +%H:%M:%S))"
