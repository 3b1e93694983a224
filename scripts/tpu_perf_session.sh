#!/bin/bash
# Post-queue TPU perf session (run ONLY when the queue has exited and the TPU
# is free — check runs/queue.log ends with QUEUE COMPLETE / DEADLINE / STOP).
#
# 1. Mosaic-validate + A/B the batched fused CG kernel
# 2. bench.py with grid vs batched kernel dispatch
# Results land in runs/perf/.

cd /root/repo || exit 1
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
mkdir -p runs/perf

echo "=== batched CG validation ==="
timeout 900 python scripts/validate_batched_cg.py 2>&1 | tee runs/perf/validate_batched_cg.log
rc=${PIPESTATUS[0]}
if [ $rc -ne 0 ]; then
  echo "validation FAILED (rc=$rc) — keeping grid dispatch"; exit 1
fi

echo "=== bench: grid kernel (current default) ==="
timeout 900 python bench.py 2>/dev/null | tee runs/perf/bench_grid.json

echo "=== bench: batched kernel ==="
SILT_PALLAS_BATCHED=1 timeout 900 python bench.py 2>/dev/null | tee runs/perf/bench_batched.json

python - << 'EOF'
import json
g = json.load(open("runs/perf/bench_grid.json"))
b = json.load(open("runs/perf/bench_batched.json"))
print(f"grid:    {g['value']*1e3:.2f} ms/iter")
print(f"batched: {b['value']*1e3:.2f} ms/iter  ({g['value']/b['value']:.2f}x)")
EOF
