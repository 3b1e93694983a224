#!/bin/bash
# Post-queue TPU perf session (round 4): runs as soon as the workload queue
# process exits. ONE TPU process at a time (CLAUDE.md) — this script is the
# next holder of the chip after the queue.
cd /root/repo || exit 1
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
QPID=$(cat /tmp/queue.pid 2>/dev/null)
while [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; do sleep 20; done
sleep 10
log() { echo "[$(date '+%F %T')] $*"; }
log "queue exited — starting perf session"
log "=== validate_fd_pcg ==="
timeout 1200 python scripts/validate_fd_pcg.py
log "=== bench.py (post-validation dispatch state) ==="
timeout 1800 python bench.py | tee runs/bench_fdpcg.json
log "=== profile_step ==="
timeout 1800 python scripts/profile_step.py --iters 10 || true
log "PERF SESSION DONE"
