#!/bin/bash
# Round-5 batch 4: capture the metrics whose first sweep died (TPU worker
# restart / transient remote-compile 500s / session end mid-run).
# Usage: nohup bash scripts/r5_batch4.sh > artifacts/r5_batch4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name="$1"; shift
  echo "=== $name: python bench.py $* ($(date +%H:%M:%S))"
  timeout 1800 python bench.py "$@" 2>/dev/null | tail -1
}

run sddmm_clustered     --metric sddmm_clustered
run gat_layer_fused     --metric gat_layer
run gat_layer_xla       --metric gat_layer --gat-xla
run gat_layer_grad      --metric gat_layer_grad
run spmm_sampled        --metric spmm_sampled
run spmm_clustered_grad --metric spmm_clustered_grad
echo "=== batch4 done ($(date +%H:%M:%S))"
