#!/bin/bash
# Round-5 batch 7: weighted-fused bitequal re-check after the pair-table
# reshape fix, weighted bench, GAT stage decomposition + resized A/B, and
# the spmm_sampled compile repro with full stderr.
# Usage: nohup bash scripts/r5_batch7.sh > artifacts/r5_batch7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== exp_wfused_diag ($(date +%H:%M:%S))"
timeout 2400 python scripts/exp_wfused_diag.py 2>&1 | tail -12
echo "=== weighted TPU test ($(date +%H:%M:%S))"
WGTPU_TEST_TPU=1 timeout 1800 python -m pytest tests/test_pallas_tpu.py \
  -k "weighted_fused" -q 2>&1 | tail -3
echo "=== weighted_sampling bench ($(date +%H:%M:%S))"
timeout 1800 python bench.py --metric weighted_sampling 2>/dev/null | tail -1
echo "=== exp_gat_decomp ($(date +%H:%M:%S))"
timeout 2400 python scripts/exp_gat_decomp.py 2>&1 | tail -12
echo "=== exp_sampled_compile full stderr ($(date +%H:%M:%S))"
timeout 2400 python scripts/exp_sampled_compile.py 2>&1 | tail -40
echo "=== gat_layer fused n=256K ($(date +%H:%M:%S))"
timeout 1800 python bench.py --metric gat_layer 2>/dev/null | tail -1
echo "=== gat_layer xla n=256K ($(date +%H:%M:%S))"
timeout 1800 python bench.py --metric gat_layer --gat-xla 2>/dev/null | tail -1
echo "=== gat_layer_grad n=256K ($(date +%H:%M:%S))"
timeout 1800 python bench.py --metric gat_layer_grad 2>/dev/null | tail -1
echo "=== batch7 done ($(date +%H:%M:%S))"
