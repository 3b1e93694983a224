#!/bin/bash
# Round-5b serial TPU queue: the remaining round-5 work after the second VM
# reset (which wiped runs/ + every gitignored dataset/model dir mid-queue).
# Already landed and git-tracked (skipped here via restored markers):
#   * conv/advect kernel hardware validation (artifacts/perf/*_validate.log;
#     advect_ok dispatch marker is git-tracked so the kernel is live)
#   * burgers a3 retrains: SOL-04 (seeds 0,1,2), NON (seeds 0,1), src, evals
#   * r4a alpha=0.01 eval archive (results_full_workload/r4a_alpha001/)
# Remaining, in judge-value order (VERDICT r4 next-steps #1, #5):
#   1. final bench capture with the advect kernel live (lock it in FIRST —
#      round 4 lost its capture to an outage, round 5a to the VM reset)
#   2. karman data regen (deterministic, seeds unchanged)
#   3. a3 karman retrains at shipped defaults: SOL-32, NON, src row, SOL-08
#      (+ CPU evals off the critical path is not worth the 1-core contention;
#      evals run serial but cost ~60 s each via cpu_eval_batch.py)
#   4. burgers NON seed-2 (completes the 3-seed SOL-vs-NON adjudication)
#   5. PRE chains (burgers prejm first — the row flagged by VERDICT r4) —
#      deadline-capped tail.
# Stage machinery copied from scripts/round5_queue.sh (artifact-verified done
# markers, deadline caps, auto-resume); see comments there.

cd /root/repo || exit 1
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p runs/done runs/logs runs/jaxcache results_full_workload artifacts
PY="python -u -m solver_in_the_loop_tpu"
RES=results_full_workload
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-9000} ))
STAGE_TIMEOUT=${STAGE_TIMEOUT:-7200}

note() { echo "[$(date '+%F %T')] $*" >> runs/queue.log; }

guard() {
  if [ -f runs/STOP ]; then note "STOP file — queue exiting"; exit 0; fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    note "DEADLINE reached — queue exiting (re-exec to continue)"; exit 0
  fi
}

run_stage() {  # run_stage NAME [-V verify_glob] [-T timeout_s] [deps...] -- cmd...
  local name=$1; shift
  local verify="" stage_to="$STAGE_TIMEOUT"
  while true; do
    if [ "$1" = "-V" ]; then verify=$2; shift 2
    elif [ "$1" = "-T" ]; then stage_to=$2; shift 2
    else break; fi
  done
  local deps=()
  while [ "$1" != "--" ]; do deps+=("$1"); shift; done
  shift
  if [ -f "runs/done/$name" ]; then
    if [ -z "$verify" ] || compgen -G "$verify" > /dev/null; then
      note "SKIP $name (done)"; return 0
    fi
    note "STALE marker $name (no $verify) — removing marker, rerunning"
    rm -f "runs/done/$name"
  fi
  guard
  local d
  for d in "${deps[@]}"; do
    if [ ! -f "runs/done/$d" ]; then note "SKIP $name (dep $d not done)"; return 1; fi
  done
  local remain=$(( DEADLINE - $(date +%s) ))
  if [ "$remain" -lt 60 ]; then note "SKIP $name (deadline imminent)"; return 1; fi
  [ "$remain" -lt "$stage_to" ] && stage_to=$remain
  note "START $name"
  local t0=$SECONDS rc
  timeout -k 60 "$stage_to" "$@" >> "runs/logs/$name.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    if [ -n "$verify" ] && ! compgen -G "$verify" > /dev/null; then
      note "FAIL $name (rc=0 but no $verify) — not marking done"; return 1
    fi
    note "DONE $name ($((SECONDS-t0))s)"; touch "runs/done/$name"; return 0
  fi
  if [ $((SECONDS-t0)) -lt 20 ]; then
    note "FAIL $name (rc=$rc in <20s, deterministic — no retry) — runs/logs/$name.log"
    return 1
  fi
  note "RETRY $name (rc=$rc) after 90s (tunnel flake?)"
  sleep 90
  guard
  remain=$(( DEADLINE - $(date +%s) ))
  if [ "$remain" -lt 60 ]; then note "SKIP $name retry (deadline imminent)"; return 1; fi
  [ "$remain" -lt "$stage_to" ] && stage_to=$remain
  timeout -k 60 "$stage_to" "$@" >> "runs/logs/$name.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    if [ -n "$verify" ] && ! compgen -G "$verify" > /dev/null; then
      note "FAIL $name (retry rc=0 but no $verify) — not marking done"; return 1
    fi
    note "DONE $name on retry ($((SECONDS-t0))s)"; touch "runs/done/$name"; return 0
  fi
  note "FAIL $name (rc=$rc) — runs/logs/$name.log"
  return 1
}

preserve() {  # preserve NAME PATH...
  local name=$1; shift
  mkdir -p "artifacts/$name"
  local p
  for p in "$@"; do [ -e "$p" ] && cp -f "$p" "artifacts/$name/" 2>/dev/null; done
  return 0
}

train_stage() {  # train_stage NAME TFDIR [deps...] -- cmd...  (auto-resume + preserve)
  local name=$1 tfdir=$2; shift 2
  local deps=()
  while [ "$1" != "--" ]; do deps+=("$1"); shift; done
  shift
  run_stage "$name" -V "$tfdir/model.msgpack" "${deps[@]}" -- bash -c "
    source scripts/round2_queue_lib.sh
    R=\$(bash scripts/queue.sh --resume-flag '$tfdir')
    [ -n \"\$R\" ] && echo \"[queue] resuming: \$R\"
    $* \$R"
  local rc=$?
  preserve "$name" "$tfdir/model.msgpack" "$tfdir/dataStats.json" \
           "$tfdir/stats.json" "$tfdir/run.log"
  return $rc
}

note "ROUND5C QUEUE start (deadline $(date -d @$DEADLINE '+%F %T'))"

# ---- 0. restore completed-stage state wiped by the VM reset
[ -f runs/bench_a3.json ] || cp -f artifacts/bench_a3.json runs/bench_a3.json 2>/dev/null
for s in a3_archive conv_validate advect_validate a3_early_bench; do
  touch "runs/done/$s"
done

# ---- 1. lock the headline bench with the advect kernel live (the advect_ok
# dispatch marker is git-tracked, so dispatch state is already settled)
run_stage a3_final_bench -T 2400 -V runs/bench_a3_final.json -- bash -c '
  set -o pipefail
  SILT_BENCH_WAIT_S=300 python bench.py | tee runs/bench_a3_final.tmp || exit 1
  grep -q "\"stale\": true" runs/bench_a3_final.tmp && { rm -f runs/bench_a3_final.tmp; exit 1; }
  mv runs/bench_a3_final.tmp runs/bench_a3_final.json
  cp -f runs/bench_a3_final.json runs/bench_a3.json
  cp -f runs/bench_a3_final.json artifacts/bench_a3.json 2>/dev/null; true'

# ---- 2. karman data (deterministic regeneration, seeds unchanged)
run_stage k_gen_train -T 3600 -V karman-fdt-hires-set/sim_000005/velo_001499.npz -- bash -c '
  [ -f karman-fdt-hires-set/sim_000005/velo_001499.npz ] && exit 0
  rm -rf karman-fdt-hires-set
  python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-hires-set -r 128 -l 100 --seed 0 --thumb \
      --re 160000 320000 640000 1280000 2560000 5120000'

run_stage k_gen_test -T 3600 -V karman-fdt-hires-testset/sim_000004/velo_001499.npz -- bash -c '
  [ -f karman-fdt-hires-testset/sim_000004/velo_001499.npz ] && exit 0
  rm -rf karman-fdt-hires-testset
  python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-hires-testset -r 128 -l 100 --seed 0 --thumb \
      --re 240000 480000 960000 1920000 3840000'

# ---- 3. karman headline retrain at shipped defaults (longest pole first)
train_stage a3_k_sol32 karman-fdt-sol32-a3/tf k_gen_train -- \
  $PY karman-train --tf karman-fdt-sol32-a3/tf --log karman-fdt-sol32-a3/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set

run_stage a3_k_sol32_test -V karman-fdt-sol32-a3/run_test/sim_000004/velTf_000499.npz a3_k_sol32 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-sol32-a3/run_test karman-fdt-sol32-a3/tf/model.msgpack karman-fdt-sol32-a3/tf/dataStats.json'
run_stage a3_k_eval_sol32 -V results_full_workload/eval100_sol32_re3840000.json a3_k_sol32_test -- \
  python -u scripts/cpu_eval_batch.py k_eval sol32 karman-fdt-sol32-a3/run_test

# ---- 4. karman NON + source row + SOL-08
train_stage a3_k_non karman-fdt-non-a3/tf a3_k_sol32 -- \
  $PY karman-train --tf karman-fdt-non-a3/tf --log karman-fdt-non-a3/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 1 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds
run_stage a3_k_non_test -V karman-fdt-non-a3/run_test/sim_000004/velTf_000499.npz a3_k_non k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-non-a3/run_test karman-fdt-non-a3/tf/model.msgpack karman-fdt-non-a3/tf/dataStats.json'
run_stage a3_k_eval_non -V results_full_workload/eval100_non_re3840000.json a3_k_non_test -- \
  python -u scripts/cpu_eval_batch.py k_eval non karman-fdt-non-a3/run_test

# NOTE: no k_src re-run — the source-solver row is model-free (`--no-model`
# ignores the net and the stats), so the round-4 eval_src/eval100_src numbers
# are already the a3 numbers: same seeds, same deterministic data regen,
# alpha never enters. Documented in BENCH.md.

# ---- 5. karman SOL-08 retrain FIRST (round5c reorder: with the late
# SOL-32 start, the burgers seed-2 chain cannot finish before any plausible
# deadline, while the SOL-08 chain completes the full karman a3 matrix)
train_stage a3_k_sol08 karman-fdt-sol08-a3/tf a3_k_sol32 -- \
  $PY karman-train --tf karman-fdt-sol08-a3/tf --log karman-fdt-sol08-a3/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 8 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds
run_stage a3_k_sol08_test -V karman-fdt-sol08-a3/run_test/sim_000004/velTf_000499.npz a3_k_sol08 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-sol08-a3/run_test karman-fdt-sol08-a3/tf/model.msgpack karman-fdt-sol08-a3/tf/dataStats.json'
run_stage a3_k_eval_sol08 -V results_full_workload/eval100_sol08_re3840000.json a3_k_sol08_test -- \
  python -u scripts/cpu_eval_batch.py k_eval sol08 karman-fdt-sol08-a3/run_test

# ---- 6. post-kernel step profile (guides the next op-count lever)
run_stage a3_profile -T 1800 -V runs/profile_r5.log -- bash -c '
  python -u scripts/profile_step.py --by-name --iters 20 --out runs/profile_r5 \
    > runs/profile_r5.log 2>&1 || exit 1
  mkdir -p artifacts/perf && cp -f runs/profile_r5.log artifacts/perf/'

# ---- 7a. burgers NON seed-2 (n=3 adjudication; after SOL-08 in 5c)
run_stage b_gen_train -T 5400 -V burgers-fdt-hires-set/sim_000009/velo_000199.npz -- bash -c '
  for i in 0 1 2 3 4 5 6 7 8 9; do
    sim=burgers-fdt-hires-set/sim_$(printf "%06d" $i)
    [ -f $sim/velo_000199.npz ] && continue
    rm -rf $sim
    python -u -m solver_in_the_loop_tpu burgers-gen -o burgers-fdt-hires-set -r 128 -l 32 \
        --dt 0.1 -s 30 -t 200 --seed $i --thumb || exit 1
  done'

run_stage b_gen_test -T 3600 -V burgers-fdt-hires-testset/sim_000004/velo_000199.npz -- bash -c '
  n=0
  for i in 100 101 102 103 104; do
    sim=burgers-fdt-hires-testset/sim_$(printf "%06d" $n)
    n=$((n+1))
    [ -f $sim/velo_000199.npz ] && continue
    rm -rf $sim
    python -u -m solver_in_the_loop_tpu burgers-gen -o burgers-fdt-hires-testset -r 128 -l 32 \
        --dt 0.1 -s 30 -t 200 --seed $i --thumb || exit 1
  done'

train_stage a3_b_non_s2 burgers-fdt-non-a3s2/tf b_gen_train -- \
  $PY burgers-train --tf burgers-fdt-non-a3s2/tf --log burgers-fdt-non-a3s2/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 2 \
      --train burgers-fdt-hires-set
run_stage a3_b_non_s2_test -V burgers-fdt-non-a3s2/run_test/sim_000004/velTf_000199.npz a3_b_non_s2 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-non-a3s2/run_test burgers-fdt-non-a3s2/tf/model.msgpack burgers-fdt-non-a3s2/tf/dataStats.json'
run_stage a3_b_eval_non_s2 -V results_full_workload/eval_burgers_non_s2_seed104.json a3_b_non_s2_test -- \
  python -u scripts/cpu_eval_batch.py b_eval non_s2 burgers-fdt-non-a3s2/run_test

# ---- 7. burgers PRE chains (prejm first — the row VERDICT r4 flagged: it
# must finally train the exact jupiter_moon block). Gen is per-sim resumable.
for i in 0 1 2 3 4 5 6 7 8 9; do
  run_stage "b_pre_sim$i" -T 2400 -V "burgers-fdt-pre-set/sim_$(printf '%06d' $i)/corr_000199.npz" b_gen_train -- bash -c "
    sim=$(printf '%06d' $i)
    [ -f burgers-fdt-pre-set/sim_\$sim/corr_000199.npz ] && exit 0
    rm -rf burgers-fdt-pre-set/sim_\$sim
    python -u -m solver_in_the_loop_tpu burgers-pre-gen -o burgers-fdt-pre-set -r 32 -l 32 \
        --dt 0.1 -t 200 --beta 1.0 \
        --initvH burgers-fdt-hires-set/sim_\$sim/velo_000000.npz \
        --loadfH \"burgers-fdt-hires-set/sim_\$sim/forc_0*.npz\""
done

train_stage a3_b_pre_jm burgers-fdt-pre-jm-a3/tf b_pre_sim9 -- \
  $PY burgers-pre-train -o burgers-fdt-pre-jm-a3/tf --model jupiter_moon \
      --seed 0 --val 0.05 --epochs 400 'burgers-fdt-pre-set/sim_0*/'
run_stage a3_b_pre_jm_test -V burgers-fdt-pre-jm-a3/run_test/sim_000004/velTf_000199.npz a3_b_pre_jm b_gen_test -- \
  python -u scripts/apply_batch.py b_pre_run_test burgers-fdt-pre-jm-a3/run_test burgers-fdt-pre-jm-a3/tf --arch jupiter_moon
run_stage a3_b_eval_pre_jm -V results_full_workload/eval_burgers_prejm_seed104.json a3_b_pre_jm_test -- \
  python -u scripts/cpu_eval_batch.py b_eval prejm burgers-fdt-pre-jm-a3/run_test

train_stage a3_b_pre burgers-fdt-pre-a3/tf b_pre_sim9 -- \
  $PY burgers-pre-train -o burgers-fdt-pre-a3/tf --seed 0 --val 0.05 --epochs 400 \
      'burgers-fdt-pre-set/sim_0*/'
run_stage a3_b_pre_test -V burgers-fdt-pre-a3/run_test/sim_000004/velTf_000199.npz a3_b_pre b_gen_test -- \
  python -u scripts/apply_batch.py b_pre_run_test burgers-fdt-pre-a3/run_test burgers-fdt-pre-a3/tf
run_stage a3_b_eval_pre -V results_full_workload/eval_burgers_pre_seed104.json a3_b_pre_test -- \
  python -u scripts/cpu_eval_batch.py b_eval pre burgers-fdt-pre-a3/run_test

# ---- 8. karman PRE chains (beta=1.0 standard set, then beta=0 PRE-SR)
for i in 0 1 2 3 4 5; do
  re=$(( 10000 * (2**(i+4)) ))
  run_stage "k_pre_sim$i" -T 2400 -V "karman-fdt-pre-set/sim_$(printf '%06d' $i)/corr_001499.npz" -- bash -c "
    sim=karman-fdt-pre-set/sim_$(printf '%06d' $i)
    [ -f \$sim/corr_001499.npz ] && exit 0
    rm -rf \$sim
    python -u -m solver_in_the_loop_tpu karman-pre-gen -o karman-fdt-pre-set \
        -r 32 -l 100 --re $re --seed 0 --beta 1.0"
done

train_stage a3_k_pre karman-fdt-pre-a3/tf k_pre_sim5 -- \
  $PY karman-pre-train -o karman-fdt-pre-a3/tf --seed 0 --val 0.05 --epochs 400 --augment \
      'karman-fdt-pre-set/sim_0*/'
run_stage a3_k_pre_test -V karman-fdt-pre-a3/run_test/sim_000004/velTf_000499.npz a3_k_pre k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; pre_run_test karman-fdt-pre-a3/run_test karman-fdt-pre-a3/tf'
run_stage a3_k_eval_pre -V results_full_workload/eval100_pre_re3840000.json a3_k_pre_test -- \
  python -u scripts/cpu_eval_batch.py k_eval pre karman-fdt-pre-a3/run_test

for i in 0 1 2 3 4 5; do
  re=$(( 10000 * (2**(i+4)) ))
  run_stage "k_presr_sim$i" -T 2400 -V "karman-fdt-presr-set/sim_$(printf '%06d' $i)/corr_001499.npz" -- bash -c "
    sim=karman-fdt-presr-set/sim_$(printf '%06d' $i)
    [ -f \$sim/corr_001499.npz ] && exit 0
    rm -rf \$sim
    python -u -m solver_in_the_loop_tpu karman-pre-gen -o karman-fdt-presr-set \
        -r 32 -l 100 --re $re --seed 0 --beta 0"
done

train_stage a3_k_presr karman-fdt-presr-a3/tf k_presr_sim5 -- \
  $PY karman-pre-train -o karman-fdt-presr-a3/tf --seed 0 --val 0.05 --epochs 400 --augment \
      'karman-fdt-presr-set/sim_0*/'
run_stage a3_k_presr_test -V karman-fdt-presr-a3/run_test/sim_000004/velTf_000499.npz a3_k_presr k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; pre_run_test karman-fdt-presr-a3/run_test karman-fdt-presr-a3/tf'
run_stage a3_k_eval_presr -V results_full_workload/eval100_presr_re3840000.json a3_k_presr_test -- \
  python -u scripts/cpu_eval_batch.py k_eval presr karman-fdt-presr-a3/run_test

note "ROUND5C QUEUE COMPLETE"
