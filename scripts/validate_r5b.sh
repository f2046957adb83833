#!/bin/bash
# Round-5 FINAL on-silicon validation sweep (VERDICT r4 #7): every headline +
# non-headline metric in one session, JSON lines recorded, so round-over-round
# regressions are visible without trusting README prose.  Supersedes
# validate_r5.sh's first-half-of-round capture (artifacts/validate_r5.log).
# Usage: nohup bash scripts/validate_r5b.sh > artifacts/validate_r5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name="$1"; shift
  echo "=== $name: python bench.py $* ($(date +%H:%M:%S))"
  timeout 1800 python bench.py "$@" 2>/dev/null | tail -1
}

run gather_sorted_headline --metric gather_sorted            # bf16 default (r5)
run gather_sorted_f32      --metric gather_sorted --dtype f32
run gather_random          --metric gather_random
run scatter                --metric scatter
run train_step_default     --metric train_step
run train_step_chunk32k    --metric train_step --unique-chunk 32768
run gat_layer_fused        --metric gat_layer
run gat_layer_xla          --metric gat_layer --gat-xla
run gat_layer_grad         --metric gat_layer_grad
run spmm_clustered         --metric spmm_clustered
run spmm_clustered_grad    --metric spmm_clustered_grad
run spmm_sampled           --metric spmm_sampled
run spmm_sampled_padded    --metric spmm_sampled --sampled-padded
run sddmm_clustered        --metric sddmm_clustered
run apply                  --metric apply
run host_gather_sorted     --metric host_gather_sorted
run sampling               --metric sampling
run weighted_sampling      --metric weighted_sampling
run spmm                   --metric spmm
echo "=== sweep done ($(date +%H:%M:%S))"
