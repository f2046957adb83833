#!/bin/bash
# Round-5 batch 6: TPU tests for the new kernels, then the bench metrics the
# r5b levers move (sampling slab+select, sddmm split2, spmm grad via split2
# dw, windowed spmm_sampled with the VMEM-safe 2048 windows), then the A/B
# that decides the select default at the real bench shape.
# Usage: nohup bash scripts/r5_batch6.sh > artifacts/r5_batch6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 1800 "$@" 2>&1 | tail -3
}

echo "=== new-kernel TPU tests ($(date +%H:%M:%S))"
WGTPU_TEST_TPU=1 timeout 1800 python -m pytest tests/test_pallas_tpu.py \
  -k "select_lanes or slab or col_one_block or weighted" -q 2>&1 | tail -4

run sampling            python bench.py --metric sampling
run sampling_slab_only  env WGTPU_SELECT_PALLAS=0 python bench.py --metric sampling
run weighted_sampling   python bench.py --metric weighted_sampling
echo "=== exp_sddmm_xla2: the XLA bar for dw routing ($(date +%H:%M:%S))"
timeout 1800 python scripts/exp_sddmm_xla2.py 2>&1 | tail -4
run spmm_clustered_grad python bench.py --metric spmm_clustered_grad
run spmm_sampled        python bench.py --metric spmm_sampled
run spmm_sampled_padded python bench.py --metric spmm_sampled --sampled-padded
run train_step          python bench.py --metric train_step --unique-chunk 32768
run gat_layer_fused     python bench.py --metric gat_layer
run gat_layer_xla       python bench.py --metric gat_layer --gat-xla
run gat_layer_grad      python bench.py --metric gat_layer_grad
echo "=== batch6 done ($(date +%H:%M:%S))"
