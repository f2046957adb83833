#!/bin/bash
# Round-5 on-silicon validation sweep: runs every headline + non-headline
# bench metric in ONE session and records the JSON lines, so round-over-round
# regressions are visible without trusting README prose (VERDICT r4 item 7).
# Usage: nohup bash scripts/validate_r5.sh > artifacts/validate_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name="$1"; shift
  echo "=== $name: python bench.py $* ($(date +%H:%M:%S))"
  timeout 1800 python bench.py "$@" 2>/dev/null | tail -1
}

run gather_sorted_f32   --metric gather_sorted
run gather_sorted_bf16  --metric gather_sorted --dtype bf16
run train_step_default  --metric train_step
run train_step_r4mode   --metric train_step --no-assume-unique
run train_step_chunk16k --metric train_step --unique-chunk 16384
run train_step_chunk32k --metric train_step --unique-chunk 32768
run train_step_bf16     --metric train_step --dtype bf16
run gat_layer_fused     --metric gat_layer
run gat_layer_xla       --metric gat_layer --gat-xla
run gat_layer_grad      --metric gat_layer_grad
run spmm_clustered      --metric spmm_clustered
run spmm_clustered_grad --metric spmm_clustered_grad
run spmm_sampled        --metric spmm_sampled
run spmm_sampled_padded --metric spmm_sampled --sampled-padded
run sddmm_clustered     --metric sddmm_clustered
run apply               --metric apply
run host_gather_sorted  --metric host_gather_sorted
run sampling            --metric sampling
run weighted_sampling   --metric weighted_sampling
echo "=== sweep done ($(date +%H:%M:%S))"
