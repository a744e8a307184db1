# Shared helpers for the serialized TPU run queues (tpu_queue_*.sh).
# Source this instead of copy-pasting run() (review finding r3: the helper
# had drifted across 13 queue scripts):
#
#   #!/bin/bash
#   set -u
#   cd /root/repo
#   source experiments/queue_lib.sh
#   queue_init r4a            # writes /tmp/tpu_queue_r4a.pid
#   queue_wait_for r3m        # block until the previous queue's pid dies
#   run experiments/log/train_X.log python -m msmp_pde_tpu.training.train ...
#
# TIMEOUT (seconds, default 7200) bounds each attempt; RETRIES (default 10)
# bounds attempts. run() retries only on the transient chip signatures —
# anything else is a real failure and returns 1 so the queue moves on.
# NEVER edit a *running* queue script in place (bash reads incrementally);
# chain a new script instead.

export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
TIMEOUT=${TIMEOUT:-7200}
RETRIES=${RETRIES:-10}

queue_init() {
  echo $$ > "/tmp/tpu_queue_$1.pid"
}

queue_wait_for() {
  local pidfile="/tmp/tpu_queue_$1.pid"
  while [ -f "$pidfile" ] && kill -0 "$(cat "$pidfile")" 2>/dev/null; do
    sleep 60
  done
}

run() {
  local log=$1; shift
  local attempt
  for attempt in $(seq 1 "$RETRIES"); do
    echo "=== $(date +%H:%M:%S) RUN (attempt $attempt/$RETRIES): $* ==="
    timeout "$TIMEOUT" "$@" > "$log" 2>&1
    local rc=$?
    echo "=== $(date +%H:%M:%S) exit $rc ==="
    [ "$rc" -eq 0 ] && return 0
    grep -q "No jellyfish device found\|Unable to initialize backend" "$log" \
      || return 1
    sleep 60
  done
  return 1
}

# Re-run a stage only when its log lacks the train CLI's completion footer
# ("Elapsed Time :", printed after the final test metrics). Used by the
# catch-all queues that sweep up stages lost to backend outages.
run_if_incomplete() {
  local log=$1
  if [ -f "$log" ] && grep -q "Elapsed Time" "$log"; then
    echo "=== skip (complete): $log ==="
    return 0
  fi
  run "$@"
}

# Block until the accelerator backend initializes (bounded probe per
# attempt: a downed backend makes an in-process init hang ~25 min before
# failing). Added round 4 — queues r4a/b/c carry an inline copy because
# they were already RUNNING when this landed (never edit a running bash
# script); every future queue should use this one.
backend_gate() {
  while true; do
    if timeout 1800 python - <<'PYEOF' 2>&1 | grep -q BACKEND_UP
import jax
print("BACKEND_UP", jax.devices())
PYEOF
    then
      echo "=== $(date +%H:%M:%S) backend gate: UP ==="
      return 0
    fi
    echo "=== $(date +%H:%M:%S) backend gate: still down ==="
    sleep 30
  done
}
