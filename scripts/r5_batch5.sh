#!/bin/bash
# Round-5 batch 5: uniform col-fetch A/B (pallas select + slab DMA), SDDMM
# select-mode A/B, spmm_sampled windowed retry WITH stderr captured, then
# the crash-prone GAT chain bisect LAST (a worker crash poisons later runs).
# Usage: nohup bash scripts/r5_batch5.sh > artifacts/r5_batch5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== exp_uniform_select ($(date +%H:%M:%S))"
timeout 2400 python scripts/exp_uniform_select.py 2>&1 | tail -20
echo "=== exp_sddmm_modes ($(date +%H:%M:%S))"
timeout 2400 python scripts/exp_sddmm_modes.py 2>&1 | tail -10
echo "=== spmm_sampled windowed retry, stderr visible ($(date +%H:%M:%S))"
timeout 1800 python bench.py --metric spmm_sampled 2>&1 | tail -15
echo "=== exp_gat_chain — crash-prone, LAST ($(date +%H:%M:%S))"
timeout 2400 python scripts/exp_gat_chain.py 2>&1 | tail -30
echo "=== batch5 done ($(date +%H:%M:%S))"
