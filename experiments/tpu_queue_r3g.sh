#!/bin/bash
# Round-3 queue G (chains after r3f): validate bench.py (new MFU path) on chip
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3g.pid

while [ -f /tmp/tpu_queue_r3f.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3f.pid)" 2>/dev/null; do
  sleep 60
done

run() {
  log=$1; shift
  for attempt in 1 2 3 4 5 6 7 8 9 10; do
    echo "=== $(date +%H:%M:%S) RUN: $* ==="
    timeout 7200 "$@" > "$log" 2>&1
    rc=$?
    echo "=== $(date +%H:%M:%S) exit $rc ==="
    [ $rc -eq 0 ] && return 0
    grep -q "No jellyfish device found\|Unable to initialize backend" "$log" || return 1
    sleep 60
  done
}

run experiments/log/bench_r3.log python bench.py

echo "R3G COMPLETE"
