#!/bin/bash
# Wait for the TPU tunnel to answer, then exec the workload queue.
#
# The axon tunnel outage that started 2026-08-17 ~19:30 blocked the a3_*
# re-campaign; a fresh process can stall minutes before the tunnel answers
# (CLAUDE.md), so each probe gets a generous timeout and failures just loop.
cd /root/repo || exit 1
END_TS=${END_TS:?set END_TS (unix seconds) for the queue deadline}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-420}
note() { echo "[$(date '+%F %T')] $*" >> runs/queue.log; }
mkdir -p runs
note "WAITER start (deadline $(date -d @$END_TS '+%F %T'))"
n=0
while true; do
  if [ -f runs/STOP ]; then note "WAITER: STOP file — exiting"; exit 0; fi
  now=$(date +%s)
  if [ "$now" -ge "$END_TS" ]; then note "WAITER: deadline passed — exiting"; exit 0; fi
  n=$((n+1))
  if timeout "$PROBE_TIMEOUT" python -c 'import jax; assert jax.default_backend()=="tpu", jax.default_backend(); print(jax.devices())' \
      >> runs/logs/tpu_probe.log 2>&1; then
    note "WAITER: TPU answered on probe $n — launching queue"
    break
  fi
  note "WAITER: probe $n failed/timed out (${PROBE_TIMEOUT}s) — retrying in 60s"
  sleep 60
done
now=$(date +%s)
export QUEUE_BUDGET_S=$(( END_TS - now ))
note "WAITER: QUEUE_BUDGET_S=$QUEUE_BUDGET_S"
exec bash scripts/queue.sh
