#!/bin/bash
# Sequential on-hardware validation (run ONE of these at a time: concurrent
# TPU processes through the axon tunnel contend, and killing one mid-compile
# can wedge the relay/compile-helper for hours — see docs/DESIGN.md notes).
# Generous timeouts: multi-pallas programs can take ~10+ min of remote
# compile even after the 256-step unroll bound.
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
WGTPU_TEST_TPU=1 timeout 3600 python -m pytest tests/test_pallas_tpu.py -q 2>&1 | tail -2
echo "=== 3. remaining bench modes ==="
for m in gather_random scatter apply sampling weighted_sampling spmm host_gather; do
  echo "--- $m"
  timeout 2400 python bench.py --metric "$m" 2>&1 | tail -1
done
echo VALIDATE_DONE
