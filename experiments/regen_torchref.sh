#!/bin/bash
# Regenerate the torch-reference interchange fixtures wiped by the Aug-18
# re-image (data_torchref/ is gitignored), plus the small our-side RP/KF
# test groups the stats tests compare against. Un-skips the 12
# tests/test_interchange.py skips. Counts are sized to what the tests
# read: test-mode n=128 for the stats checks (CE valid also asserted 128),
# reference-default 32 for the serial-Radau WE files, tiny train/valid
# elsewhere (only existence / test groups are consumed).
#
# CPU chain runs nice -n 19 (the 1-core host also dispatches the TPU train
# queue); chip chain retries on init races (the tunnel multiplexes, so
# these interleave with running trains at a mild slowdown).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p experiments/log

chip_gen() {  # chip_gen <exp>
  local exp=$1 i
  for i in $(seq 1 30); do
    timeout 3600 python -m msmp_pde_tpu.datagen.generate --experiment="$exp" \
      --train_samples=16 --valid_samples=8 --test_samples=128 \
      --batch_size=16 --platform=tpu --dtype=float32 \
      > "experiments/log/datagen_${exp}_small.log" 2>&1 && return 0
    grep -q "No jellyfish device found\|Unable to initialize backend" \
      "experiments/log/datagen_${exp}_small.log" || return 1
    sleep 60
  done
  return 1
}

if [ "${1:-}" = "chip" ]; then
  [ -f data/AD_RP.h5 ] || chip_gen RP
  [ -f data/KF_KF.h5 ] || chip_gen KF
  echo "CHIP_FIXTURES_DONE"
  exit 0
fi

# --- CPU chain (torch reference generators, serial) ---
run_cpu() {  # run_cpu <log> <cmd...>
  local log=$1; shift
  echo "=== $(date +%H:%M:%S) $* ==="
  nice -n 19 timeout 7200 "$@" > "$log" 2>&1
  echo "=== exit $? ==="
}

run_cpu experiments/log/torchref_e1_regen.log \
  python experiments/torchref_e1.py --train 16 --valid 128 --test 128
run_cpu experiments/log/torchref_ks_regen.log \
  python experiments/torchref_ks.py
run_cpu experiments/log/torchref_mswg3_regen.log \
  python experiments/torchref_gen.py --experiment=MSWG3 --train 4 --valid 4 --test 128
run_cpu experiments/log/torchref_rp_regen.log \
  python experiments/torchref_gen.py --experiment=RP --train 4 --valid 4 --test 128
run_cpu experiments/log/torchref_kf_regen.log \
  python experiments/torchref_gen.py --experiment=KF --train 4 --valid 4 --test 128
for task in WE1 WE2 WE3; do
  run_cpu "experiments/log/torchref_${task}_regen.log" \
    python experiments/torchref_gen.py --experiment=$task --train 2 --valid 2 --test 32
done
echo "CPU_FIXTURES_DONE"
