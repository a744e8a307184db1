#!/bin/bash
# Round-3 queue P (chains after the r3o catch-all): serving-path benchmark
# on the real chip (latency/throughput per batch bucket on the trained E1
# flagship), landed after all training stages so it never competes for the
# device.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r3p
queue_wait_for r3o

if ! grep -q '"metric"' experiments/log/bench_serving.log 2>/dev/null; then
  run experiments/log/bench_serving.log python experiments/bench_serving.py
fi
echo "R3P COMPLETE"
