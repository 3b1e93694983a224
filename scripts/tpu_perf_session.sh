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

echo "=== bench: batched kernel + ptol 1e-3 (MAE-neutral per tol_study.json) ==="
SILT_PALLAS_BATCHED=1 SILT_BENCH_PTOL=1e-3 timeout 900 python bench.py 2>/dev/null \
  | tee runs/perf/bench_batched_tol3.json

python - << 'EOF'
import json
g = json.load(open("runs/perf/bench_grid.json"))
b = json.load(open("runs/perf/bench_batched.json"))
t = json.load(open("runs/perf/bench_batched_tol3.json"))
print(f"grid @1e-5:    {g['value']*1e3:.2f} ms/iter")
print(f"batched @1e-5: {b['value']*1e3:.2f} ms/iter  ({g['value']/b['value']:.2f}x)")
print(f"batched @1e-3: {t['value']*1e3:.2f} ms/iter  ({g['value']/t['value']:.2f}x)")
EOF

# train-at-tol quality A/B: 10 epochs at ptol 1e-3 vs the 1e-5 campaign run,
# rollout-evaluated on held-out Re=480k — gates making 1e-3 the default
echo "=== 10-epoch train A/B at ptol 1e-3 ==="
timeout 3600 python -u -m solver_in_the_loop_tpu karman-train \
    --tf runs/perf/tol3_train/tf --epochs 10 --lr 0.0001 -l 100 -t 500 -s 4 \
    -m 32 -n 6 -b 3 --seed 0 --train karman-fdt-hires-set --skip-ds --ptol 1e-3 \
    2>&1 | tail -3
timeout 1200 python -u -m solver_in_the_loop_tpu karman-apply -o runs/perf/tol3_train/run_test \
    --stats runs/perf/tol3_train/tf/dataStats.json --model runs/perf/tol3_train/tf/model.msgpack \
    --initdH karman-fdt-hires-testset/sim_000001/dens_001000.npz \
    --initvH karman-fdt-hires-testset/sim_000001/velo_001000.npz \
    -d 4 -r 32 -l 100 --re 480000 -t 500 --ptol 1e-3 2>&1 | tail -1
python -u -m solver_in_the_loop_tpu evaluate --run runs/perf/tol3_train/run_test/sim_000000 \
    --ref karman-fdt-hires-testset/sim_000001 --ref-offset 1000 --scale 4 --steps 499 \
    | tee runs/perf/eval_tol3_trained.json

# baseline arm: the campaign SOL-32 run's epoch-10 checkpoint (trained at the
# 1e-5 default, same seed/data order) rolled out at ptol 1e-5 — the A/B is
# 10-epochs@1e-3 vs 10-epochs@1e-5, not vs the fully trained model
if [ -f karman-fdt-sol32/tf/model_epoch0010.msgpack ]; then
  echo "=== baseline: campaign epoch-10 checkpoint at ptol 1e-5 ==="
  timeout 1200 python -u -m solver_in_the_loop_tpu karman-apply -o runs/perf/tol5_ep10/run_test \
      --stats karman-fdt-sol32/tf/dataStats.json \
      --model karman-fdt-sol32/tf/model_epoch0010.msgpack \
      --initdH karman-fdt-hires-testset/sim_000001/dens_001000.npz \
      --initvH karman-fdt-hires-testset/sim_000001/velo_001000.npz \
      -d 4 -r 32 -l 100 --re 480000 -t 500 2>&1 | tail -1
  python -u -m solver_in_the_loop_tpu evaluate --run runs/perf/tol5_ep10/run_test/sim_000000 \
      --ref karman-fdt-hires-testset/sim_000001 --ref-offset 1000 --scale 4 --steps 499 \
      | tee runs/perf/eval_tol5_ep10.json
fi
cp -f runs/perf/*.json artifacts/ 2>/dev/null; true
