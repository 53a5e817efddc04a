#!/bin/bash
# Hardware validation runbook: runs the queued TPU jobs STRICTLY one at a
# time (the axon remote compiler blocks other clients entirely while one
# compiles — CLAUDE.md), logs each to /tmp/hwq/<job>.log, and skips jobs
# whose .ok marker already exists, so the queue is resumable after a
# tunnel drop. Kill a hung job by exact PID (SIGKILL; SIGTERM is ignored
# mid-RPC).
#
# Usage: bash tools/run_hw_queue.sh [job ...]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/hwq

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  if [ -e "/tmp/hwq/$name.ok" ]; then echo "SKIP $name (done)"; return 0; fi
  echo "RUN  $name: $* (timeout ${tmo}s) at $(date +%H:%M:%S)"
  if timeout -s KILL "$tmo" "$@" >"/tmp/hwq/$name.log" 2>&1; then
    touch "/tmp/hwq/$name.ok"; echo "OK   $name"; tail -3 "/tmp/hwq/$name.log"
  else
    echo "FAIL $name (rc=$?) — see /tmp/hwq/$name.log"; tail -5 "/tmp/hwq/$name.log"
    return 1
  fi
}

# membership among args 2..n ($* would include $1 itself and always match)
want() { [ $# -le 1 ] || [[ " ${*:2} " == *" $1 "* ]]; }
ARGS=("$@")

# 1. correctness gates first: full-pipeline decode + encode byte identity
want corpus "${ARGS[@]}"   && { run corpus   2400 python tools/check_corpus_tpu.py || exit 1; }
want enc_id "${ARGS[@]}"   && { run enc_id   2400 python tools/test_tpu_encoder_corpus.py || exit 1; }
# 2. entropy kernel number + representative per-stage profile
want entropy "${ARGS[@]}"  && run entropy  2400 python tools/bench_entropy_decode.py
want profile "${ARGS[@]}"  && run profile  3000 python tools/profile_device_stages.py
# 3. driver metric + REPS sweep (group utilization: 8 vs 16 vs 24 replicas)
want bench8 "${ARGS[@]}"   && run bench8   2400 env LZT_BENCH_REPS=8 python bench.py
want bench24 "${ARGS[@]}"  && run bench24  2400 python bench.py
want bench48 "${ARGS[@]}"  && run bench48  2400 env LZT_BENCH_REPS=48 python bench.py
# 4. encode e2e serving throughput
want enc_e2e "${ARGS[@]}"  && run enc_e2e  3600 python tools/bench_encode_e2e.py

echo "QUEUE DONE at $(date +%H:%M:%S)"
