#!/bin/bash
# Remaining perf-session pieces after validate_batched_cg FAILED Mosaic
# compile (runs/perf/validate_batched_cg.log): skip the batched kernel,
# measure the ptol lever and run the 10-epoch train-at-tol quality A/B.
#
# The tol3 arm passes --init zero --no-clip-grad to match the campaign
# SOL-32 config exactly (the trainer defaults flipped to reference-init
# mid-round); its baseline is the campaign run's epoch-10 checkpoint.

cd /root/repo || exit 1
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
mkdir -p runs/perf

echo "=== 10-epoch train A/B at ptol 1e-3 (campaign config: zero init, no clip) ==="
timeout 1800 python -u -m solver_in_the_loop_tpu karman-train \
    --tf runs/perf/tol3_train/tf --epochs 10 --lr 0.0001 -l 100 -t 500 -s 4 \
    -m 32 -n 6 -b 3 --seed 0 --train karman-fdt-hires-set --skip-ds \
    --init zero --no-clip-grad --ptol 1e-3 2>&1 | tail -3

echo "=== tol3 apply (ptol 1e-3) ==="
timeout 1200 python -u -m solver_in_the_loop_tpu karman-apply -o runs/perf/tol3_train/run_test \
    --stats runs/perf/tol3_train/tf/dataStats.json --model runs/perf/tol3_train/tf/model.msgpack \
    --initdH karman-fdt-hires-testset/sim_000001/dens_001000.npz \
    --initvH karman-fdt-hires-testset/sim_000001/velo_001000.npz \
    -d 4 -r 32 -l 100 --re 480000 -t 500 --ptol 1e-3 2>&1 | tail -1

echo "=== baseline: campaign epoch-10 checkpoint at ptol 1e-5 ==="
timeout 1200 python -u -m solver_in_the_loop_tpu karman-apply -o runs/perf/tol5_ep10/run_test \
    --stats karman-fdt-sol32/tf/dataStats.json \
    --model karman-fdt-sol32/tf/model_epoch0010.msgpack \
    --initdH karman-fdt-hires-testset/sim_000001/dens_001000.npz \
    --initvH karman-fdt-hires-testset/sim_000001/velo_001000.npz \
    -d 4 -r 32 -l 100 --re 480000 -t 500 2>&1 | tail -1

echo "=== bench: ptol 1e-5 (campaign default) ==="
timeout 900 python bench.py 2>/dev/null | tee runs/perf/bench_tol5.json
echo "=== bench: ptol 1e-3 ==="
SILT_BENCH_PTOL=1e-3 timeout 900 python bench.py 2>/dev/null | tee runs/perf/bench_tol3.json

echo "PERF REST DONE"
