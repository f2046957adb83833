#!/bin/bash
# Sequential on-hardware validation (run ONE of these at a time: concurrent
# TPU processes through the axon tunnel contend, and killing one mid-compile
# can wedge the relay/compile-helper for hours — see docs/DESIGN.md notes).
# Generous timeouts: multi-pallas programs can take ~10+ min of remote
# compile even after the 256-step unroll bound.
#
# Round-3 additions: wide-row split A/B (exp_widerow), packed-planes select
# A/B (exp_window_packed), host span-coalescing bench (host_gather_sorted),
# clustered MXU SpMM (spmm_clustered), and a profiler trace artifact.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
echo "=== 0. ping (device claim + tiny compile) ==="
timeout 900 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('compute:', float(jax.jit(lambda: jnp.ones((8,128)).sum())()), flush=True)
" || { echo PING_FAILED; exit 1; }
echo "=== 1. headline bench (gather_sorted) ==="
timeout 1800 python bench.py 2>&1 | tail -1
echo "=== 2. full hardware kernel suite ==="
WGTPU_TEST_TPU=1 timeout 5400 python -m pytest tests/test_pallas_tpu.py -q 2>&1 | tail -2
echo "=== 3. remaining bench modes ==="
for m in gather_random scatter apply sampling weighted_sampling spmm \
         spmm_clustered host_gather host_gather_sorted; do
  echo "--- $m"
  timeout 2400 python bench.py --metric "$m" 2>&1 | tail -1
done
echo "=== 4. wide-row gather/scatter dims (the round-2 3-4KB cliff) ==="
for d in 768 1024; do
  echo "--- gather_random dim=$d"
  timeout 2400 python bench.py --metric gather_random --dim "$d" 2>&1 | tail -1
done
echo "=== 5. A/B experiments ==="
timeout 3600 python scripts/exp_widerow.py 2>&1 | tail -20
timeout 3600 python scripts/exp_window_packed.py 2>&1 | tail -10
echo "=== 6. profiler trace artifact (SURVEY §5 tracing parity) ==="
rm -rf artifacts/trace_r3 && mkdir -p artifacts
timeout 1800 python bench.py --metric sampling --trace artifacts/trace_r3 2>&1 | tail -1
ls -la artifacts/trace_r3/plugins/profile/*/ 2>/dev/null | head -5
echo VALIDATE_DONE
