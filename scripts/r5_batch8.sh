#!/bin/bash
# Round-5 batch 8 (final): spmm_sampled with the exact single-pass bf16
# mask-weight A-build, the resized gat grad, and the GAT stage decomposition.
# Usage: nohup bash scripts/r5_batch8.sh > artifacts/r5_batch8.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== spmm_sampled bf16-mask A-build ($(date +%H:%M:%S))"
timeout 1500 python bench.py --metric spmm_sampled 2>/dev/null | tail -1
echo "=== gat_layer_grad n=128K ($(date +%H:%M:%S))"
timeout 1500 python bench.py --metric gat_layer_grad 2>/dev/null | tail -1
echo "=== exp_gat_decomp ($(date +%H:%M:%S))"
timeout 1800 python scripts/exp_gat_decomp.py 2>&1 | tail -12
echo "=== batch8 done ($(date +%H:%M:%S))"
