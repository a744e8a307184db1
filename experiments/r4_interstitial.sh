#!/bin/bash
# Round-4 interstitial measurements, run CONCURRENTLY with the serial r4f
# queue: each attempt slots into the gap between two queue stages (losing
# the race just means a TPU-init failure, which both sides retry — the
# queue's run() already retries on the "No jellyfish device found"
# signature, so a transient collision costs it ~60 s, not a stage).
#
#   1. Corrected scoped-VMEM A/B: the axon backend hard-rejects
#      --xla_tpu_scoped_vmem_limit_kib (F-level "Unknown flag" abort, see
#      experiments/log/bench_vmem_budget.log), so this arm raises only OUR
#      per-kernel estimate budget (MSMP_PALLAS_VMEM_BUDGET_MB=20: fwd
#      bb 4->8, bwd 2->4) against the backend's default scoped-vmem limit.
#      A Mosaic allocation failure is itself the A/B answer (documented).
#   2. bench.py recapture after the lem auto-default flip to nohoist_remat
#      (d2f18e2) so the driver-facing cache reflects the production path.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p experiments/log experiments/artifacts

attempt_until() {  # attempt_until <marker> <log> <cmd...>
  local marker=$1 log=$2; shift 2
  local i
  for i in $(seq 1 40); do
    if grep -q "$marker" "$log" 2>/dev/null; then return 0; fi
    echo "=== $(date +%H:%M:%S) interstitial attempt $i: $* ==="
    timeout 900 "$@" > "$log" 2>&1
    grep -q "$marker" "$log" 2>/dev/null && return 0
    # keep waiting only on chip-contention signatures
    grep -q "No jellyfish device found\|Unable to initialize backend\|backend_down.: true\|did not initialize" "$log" \
      || return 1
    sleep 90
  done
  return 1
}

attempt_until "BEST:" experiments/log/bench_vmem_budget2.log \
  env MSMP_PALLAS_VMEM_BUDGET_MB=20 python experiments/bench_vmem2.py
echo "=== vmem A/B rc=$? ==="

attempt_until '"backend_down": false' experiments/log/bench_r4_postflip.log \
  env MSMP_BENCH_WAIT_S=120 python bench.py
echo "=== postflip bench rc=$? ==="

cp -f experiments/log/bench_vmem_budget2.log \
      experiments/log/bench_r4_postflip.log \
      experiments/bench_cache.json experiments/artifacts/ 2>/dev/null
echo "INTERSTITIAL_DONE"
