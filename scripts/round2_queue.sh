#!/bin/bash
# Round-2 serial TPU workload queue: the full reference result matrix
# (VERDICT.md "Next round" items 1,2,3,5) on the single attached TPU chip.
#
# ONE TPU process at a time (CLAUDE.md) — every stage here runs strictly
# sequentially. Stages are resumable: each leaves a sentinel in runs/done/ and
# is skipped on re-run. Logs per stage in runs/logs/<stage>.log, queue summary
# in runs/queue.log. Kill + re-exec is safe.
#
# Reference protocol being reproduced: /root/reference/karman-2d/Makefile and
# /root/reference/burgers/Makefile (via the repo-root Makefile hyperparameters).

cd /root/repo || exit 1
export PYTHONUNBUFFERED=1
# persistent XLA compile cache: the gen/test sweeps re-invoke identically
# shaped programs many times across processes
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p runs/done runs/logs runs/jaxcache results_full_workload
PY="python -u -m solver_in_the_loop_tpu"
RES=results_full_workload

note() { echo "[$(date '+%F %T')] $*" >> runs/queue.log; }

run_stage() {  # run_stage NAME [deps...] -- cmd...
  local name=$1; shift
  local deps=()
  while [ "$1" != "--" ]; do deps+=("$1"); shift; done
  shift
  if [ -f "runs/done/$name" ]; then note "SKIP $name (done)"; return 0; fi
  local d
  for d in "${deps[@]}"; do
    if [ ! -f "runs/done/$d" ]; then note "SKIP $name (dep $d not done)"; return 1; fi
  done
  note "START $name"
  local t0=$SECONDS
  if "$@" >> "runs/logs/$name.log" 2>&1; then
    note "DONE $name ($((SECONDS-t0))s)"; touch "runs/done/$name"; return 0
  fi
  note "RETRY $name (rc=$?) after 90s (tunnel flake?)"
  sleep 90
  if "$@" >> "runs/logs/$name.log" 2>&1; then
    note "DONE $name on retry ($((SECONDS-t0))s)"; touch "runs/done/$name"; return 0
  fi
  note "FAIL $name (rc=$?) — runs/logs/$name.log"
  return 1
}

# ---------------------------------------------------------------- karman data
run_stage k_gen_train -- bash -c '
  rm -rf karman-fdt-hires-set
  python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-hires-set -r 128 -l 100 --seed 0 --thumb \
      --re 160000 320000 640000 1280000 2560000 5120000'

run_stage k_gen_test -- bash -c '
  rm -rf karman-fdt-hires-testset
  python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-hires-testset -r 128 -l 100 --seed 0 --thumb \
      --re 240000 480000 960000 1920000 3840000'

# ---------------------------------------------------- karman SOL-32 and NON
run_stage k_sol32 k_gen_train -- \
  $PY karman-train --tf karman-fdt-sol32/tf --log karman-fdt-sol32/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set

run_stage k_non k_gen_train -- \
  $PY karman-train --tf karman-fdt-non/tf --log karman-fdt-non/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 1 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds

# ------------------------------------------------------- karman test rollouts

run_stage k_sol32_test k_sol32 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-sol32/run_test karman-fdt-sol32/tf/model.msgpack karman-fdt-sol32/tf/dataStats.json'

run_stage k_non_test k_non k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-non/run_test karman-fdt-non/tf/model.msgpack karman-fdt-non/tf/dataStats.json'

run_stage k_src_test k_sol32 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-src/run_test karman-fdt-sol32/tf/model.msgpack karman-fdt-sol32/tf/dataStats.json --no-model'


run_stage k_eval_sol32 k_sol32_test -- bash -c '
  source scripts/round2_queue_lib.sh; k_eval sol32 karman-fdt-sol32/run_test'
run_stage k_eval_non k_non_test -- bash -c '
  source scripts/round2_queue_lib.sh; k_eval non karman-fdt-non/run_test'
run_stage k_eval_src k_src_test -- bash -c '
  source scripts/round2_queue_lib.sh; k_eval src karman-fdt-src/run_test'

# --------------------------------------------------------------- init ablation
# zero-init (our deviation) vs reference glorot init + --clip-grad (the
# reference's own blow-up mitigation), 20 epochs each; plus reference init
# WITHOUT clip for 2 epochs to document the blow-up. VERDICT item 3.
run_stage abl_zero k_gen_train -- \
  $PY karman-train --tf runs/abl_zero/tf --log runs/abl_zero/tf/run.log \
      --epochs 20 --lr 0.0001 -l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds --init zero

run_stage abl_ref k_gen_train -- \
  $PY karman-train --tf runs/abl_ref/tf --log runs/abl_ref/tf/run.log \
      --epochs 20 --lr 0.0001 -l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds --init reference --clip-grad

run_stage abl_ref_noclip k_gen_train -- \
  $PY karman-train --tf runs/abl_ref_noclip/tf --log runs/abl_ref_noclip/tf/run.log \
      --epochs 2 --lr 0.0001 -l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds --init reference


run_stage abl_zero_eval abl_zero k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; abl_eval abl_zero'
run_stage abl_ref_eval abl_ref k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; abl_eval abl_ref'

# ------------------------------------------------------------------ karman PRE

run_stage k_pre_set -- bash -c '
  source scripts/round2_queue_lib.sh; pre_gen karman-fdt-pre-set 1.0'
run_stage k_presr_set -- bash -c '
  source scripts/round2_queue_lib.sh; pre_gen karman-fdt-presr-set 0'

run_stage k_pre_train k_pre_set -- bash -c '
  source scripts/round2_queue_lib.sh
  $PY karman-pre-train -o karman-fdt-pre/tf --seed 0 --val 0.05 --epochs 400 --augment \
      karman-fdt-pre-set/sim_0*/'
run_stage k_presr_train k_presr_set -- bash -c '
  source scripts/round2_queue_lib.sh
  $PY karman-pre-train -o karman-fdt-presr/tf --seed 0 --val 0.05 --epochs 400 --augment \
      karman-fdt-presr-set/sim_0*/'


run_stage k_pre_test k_pre_train k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; pre_run_test karman-fdt-pre/run_test karman-fdt-pre/tf'
run_stage k_presr_test k_presr_train k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; pre_run_test karman-fdt-presr/run_test karman-fdt-presr/tf'

run_stage k_eval_pre k_pre_test -- bash -c '
  source scripts/round2_queue_lib.sh; k_eval pre karman-fdt-pre/run_test'
run_stage k_eval_presr k_presr_test -- bash -c '
  source scripts/round2_queue_lib.sh; k_eval presr karman-fdt-presr/run_test'

# --------------------------------------------------------------------- burgers
run_stage b_gen_train -- bash -c '
  rm -rf burgers-fdt-hires-set
  for i in 0 1 2 3 4 5 6 7 8 9; do
    python -u -m solver_in_the_loop_tpu burgers-gen -o burgers-fdt-hires-set -r 128 -l 32 \
        --dt 0.1 -s 30 -t 200 --seed $i --thumb || exit 1
  done'

run_stage b_gen_test -- bash -c '
  rm -rf burgers-fdt-hires-testset
  for i in 100 101 102 103 104; do
    python -u -m solver_in_the_loop_tpu burgers-gen -o burgers-fdt-hires-testset -r 128 -l 32 \
        --dt 0.1 -s 30 -t 200 --seed $i --thumb || exit 1
  done'

run_stage b_sol04 b_gen_train -- \
  $PY burgers-train --tf burgers-fdt-sol04/tf --log burgers-fdt-sol04/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 4 -n 10 -b 5 --seed 0 \
      --train burgers-fdt-hires-set

run_stage b_non b_gen_train -- \
  $PY burgers-train --tf burgers-fdt-non/tf --log burgers-fdt-non/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 0 \
      --train burgers-fdt-hires-set --skip-ds


run_stage b_sol04_test b_sol04 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-sol04/run_test burgers-fdt-sol04/tf/model.msgpack burgers-fdt-sol04/tf/dataStats.json'
run_stage b_non_test b_non b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-non/run_test burgers-fdt-non/tf/model.msgpack burgers-fdt-non/tf/dataStats.json'
run_stage b_src_test b_sol04 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-src/run_test burgers-fdt-sol04/tf/model.msgpack burgers-fdt-sol04/tf/dataStats.json --no-model'


run_stage b_eval_sol04 b_sol04_test -- bash -c '
  source scripts/round2_queue_lib.sh; b_eval sol04 burgers-fdt-sol04/run_test'
run_stage b_eval_non b_non_test -- bash -c '
  source scripts/round2_queue_lib.sh; b_eval non burgers-fdt-non/run_test'
run_stage b_eval_src b_src_test -- bash -c '
  source scripts/round2_queue_lib.sh; b_eval src burgers-fdt-src/run_test'

# --------------------------------------------------------------- burgers PRE
run_stage b_pre_set b_gen_train -- bash -c '
  rm -rf burgers-fdt-pre-set
  for i in 0 1 2 3 4 5 6 7 8 9; do
    sim=$(printf "%06d" $i)
    python -u -m solver_in_the_loop_tpu burgers-pre-gen -o burgers-fdt-pre-set -r 32 -l 32 \
        --dt 0.1 -t 200 --beta 1.0 \
        --initvH burgers-fdt-hires-set/sim_$sim/velo_000000.npz \
        --loadfH "burgers-fdt-hires-set/sim_$sim/forc_0*.npz" || exit 1
  done'

run_stage b_pre_train b_pre_set -- bash -c '
  source scripts/round2_queue_lib.sh
  $PY burgers-pre-train -o burgers-fdt-pre/tf --seed 0 --val 0.05 --epochs 400 --augment \
      burgers-fdt-pre-set/sim_0*/'

run_stage b_pre_test b_pre_train b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  rm -rf burgers-fdt-pre/run_test
  for i in 0 1 2 3 4; do
    sim=$(printf "%06d" $i)
    $PY burgers-pre-apply -o burgers-fdt-pre/run_test \
        --stats burgers-fdt-pre/tf/stats.json --model burgers-fdt-pre/tf/model.msgpack \
        --initvH burgers-fdt-hires-testset/sim_$sim/velo_000000.npz \
        --loadfH "burgers-fdt-hires-testset/sim_$sim/forc_0*.npz" \
        -d 4 -r 32 -l 32 --dt 0.1 -t 200 || exit 1
  done'

run_stage b_eval_pre b_pre_test -- bash -c '
  source scripts/round2_queue_lib.sh; b_eval pre burgers-fdt-pre/run_test'

note "QUEUE COMPLETE"
