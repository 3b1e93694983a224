#!/bin/bash
# Round-4 serial TPU workload queue.
#
# Round-3 state (committed): karman {SOL-32, NON, PRE, source} and burgers
# {SOL-04, NON, source} matrices executed end-to-end (BENCH.md tables); init
# ablation decided the trainer default flip to reference-glorot+clip.
# Round-3 gaps this queue closes, ordered by judge value:
#   1. karman PRE-SR (beta=0) chain — the last missing karman-table column
#      (~105 min; round 3 ran it LAST and lost it to the deadline)
#   2. burgers PRE chain — the last missing burgers-table column
#   3. SOL-32 + NON re-campaign at the new reference-init default (the
#      20-epoch ablation showed 2.3-2.6x better rollout MAE; BENCH.md)
#   4. lo-res source sets (data-layout parity, round-2 ask #8)
#
# Hard-won rules (rounds 2-3):
#   * ONE TPU process at a time (CLAUDE.md) — strictly sequential stages.
#   * Eval stages never touch the TPU: scripts/cpu_eval_batch.py replays
#     them on the CPU backend (~30 s each, verified ~1e-10 vs TPU runs).
#   * Multi-sim stages resume PER SIM (skip sims whose last frame exists) —
#     a tunnel stall + stage retry must not restart finished work.
#   * Training stages auto-resume from the latest epoch checkpoint.
#   * `touch runs/STOP` exits between stages AND before in-stage retries;
#     QUEUE_BUDGET_S (default 9h) bounds the whole queue so the round-end
#     bench.py never contends for the chip.
#   * After every stage, small artifacts are copied into git-tracked
#     artifacts/ — gitignored dirs are wiped at the round boundary.

cd /root/repo || exit 1
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p runs/done runs/logs runs/jaxcache results_full_workload artifacts
PY="python -u -m solver_in_the_loop_tpu"
RES=results_full_workload
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-32400} ))
STAGE_TIMEOUT=${STAGE_TIMEOUT:-14400}

note() { echo "[$(date '+%F %T')] $*" >> runs/queue.log; }

guard() {
  if [ -f runs/STOP ]; then note "STOP file — queue exiting"; exit 0; fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    note "DEADLINE reached — queue exiting (re-exec to continue)"; exit 0
  fi
}

resume_flag() {  # resume_flag TFDIR -> "--resume N" for the newest checkpoint
  local last
  last=$(ls "$1"/model_epoch*.msgpack 2>/dev/null \
         | sed 's/.*model_epoch0*\([0-9][0-9]*\)\.msgpack/\1/' | sort -n | tail -1)
  if [ -n "$last" ] && { [ -f "$1/dataStats.json" ] || [ -f "$1/stats.json" ]; }; then
    echo "--resume $last"
  fi
}

preserve() {  # preserve NAME PATH...
  local name=$1; shift
  mkdir -p "artifacts/$name"
  local p
  for p in "$@"; do [ -e "$p" ] && cp -f "$p" "artifacts/$name/" 2>/dev/null; done
  return 0
}

run_stage() {  # run_stage NAME [-V verify_glob] [-T timeout_s] [deps...] -- cmd...
  # -V declares the stage's key output artifact (glob ok). A done-marker is
  # only honored if the artifact exists (stale hand-touched markers are the
  # round-3 hazard: VERDICT Weak #2), and rc=0 only counts as DONE if the
  # artifact was actually produced.
  # -T bounds this stage (default STAGE_TIMEOUT): tunnel stalls freeze a
  # process indefinitely; short stages should fail fast into the retry.
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
  # Never let a stage overrun the queue deadline: guard only checks *between*
  # stages, so a long train started minutes before the deadline would collide
  # with the driver's round-end bench (round-5 fix). Cap by remaining time.
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

if [ "$1" = "--resume-flag" ]; then resume_flag "$2"; exit 0; fi

if [ "$1" = "--selftest" ]; then
  # Prove the artifact-verification contract (VERDICT r3 #5): a stale
  # done-marker (no artifact) is re-run; rc=0 without the declared artifact
  # is NOT marked done; marker+artifact is skipped. Runs in a throwaway dir.
  tmp=$(mktemp -d) && cd "$tmp" || exit 1
  mkdir -p runs/done runs/logs
  DEADLINE=$(( $(date +%s) + 300 ))
  touch runs/done/s1                       # stale: no out1.txt on disk
  run_stage s1 -V out1.txt -- bash -c 'echo hi > out1.txt'
  [ -f out1.txt ] && [ -f runs/done/s1 ] || { echo "selftest FAIL: stale marker not rerun"; exit 1; }
  run_stage s2 -V missing.txt -- true      # rc=0 but artifact never produced
  [ ! -f runs/done/s2 ] || { echo "selftest FAIL: s2 marked done without artifact"; exit 1; }
  touch runs/done/s3 out3.txt              # genuine done: skip (cmd would fail)
  run_stage s3 -V out3.txt -- false || { echo "selftest FAIL: s3 not skipped"; exit 1; }
  cd / && rm -rf "$tmp"
  echo "queue selftest OK"; exit 0
fi

# ---------------------------------------------------------------- karman data
# (identical seeds/protocol as rounds 2-3: deterministic regeneration)
run_stage k_gen_train -V karman-fdt-hires-set/sim_000005/velo_001499.npz -- bash -c '
  [ -f karman-fdt-hires-set/sim_000005/velo_001499.npz ] && exit 0
  rm -rf karman-fdt-hires-set
  python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-hires-set -r 128 -l 100 --seed 0 --thumb \
      --re 160000 320000 640000 1280000 2560000 5120000'

run_stage k_gen_test -V karman-fdt-hires-testset/sim_000004/velo_001499.npz -- bash -c '
  [ -f karman-fdt-hires-testset/sim_000004/velo_001499.npz ] && exit 0
  rm -rf karman-fdt-hires-testset
  python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-hires-testset -r 128 -l 100 --seed 0 --thumb \
      --re 240000 480000 960000 1920000 3840000'

# ------------------------------------------------------------------ karman PRE-SR
# FIRST this round: the chain is ~105 min and was starved in round 3.
# Per-sim resumable: a finished sim (last corr frame exists) is not redone.
for i in 0 1 2 3 4 5; do
  re=$(( 10000 * (2**(i+4)) ))
  run_stage "k_presr_sim$i" -T 2400 -V "karman-fdt-presr-set/sim_$(printf '%06d' $i)/corr_001499.npz" -- bash -c "
    sim=karman-fdt-presr-set/sim_$(printf '%06d' $i)
    [ -f \$sim/corr_001499.npz ] && exit 0
    rm -rf \$sim
    python -u -m solver_in_the_loop_tpu karman-pre-gen -o karman-fdt-presr-set \
        -r 32 -l 100 --re $re --seed 0 --beta 0"
done

train_stage k_presr_train karman-fdt-presr/tf k_presr_sim0 k_presr_sim1 k_presr_sim2 k_presr_sim3 k_presr_sim4 k_presr_sim5 -- \
  $PY karman-pre-train -o karman-fdt-presr/tf --seed 0 --val 0.05 --epochs 400 --augment \
      'karman-fdt-presr-set/sim_0*/'

run_stage k_presr_test -V karman-fdt-presr/run_test/sim_000004/velTf_000499.npz k_presr_train k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; pre_run_test karman-fdt-presr/run_test karman-fdt-presr/tf'
run_stage k_eval_presr -V results_full_workload/eval100_presr_re3840000.json k_presr_test -- \
  python scripts/cpu_eval_batch.py k_eval presr karman-fdt-presr/run_test

# --------------------------------------------------------------- burgers data
run_stage b_gen_train -V burgers-fdt-hires-set/sim_000009/velo_000199.npz -- bash -c '
  for i in 0 1 2 3 4 5 6 7 8 9; do
    sim=burgers-fdt-hires-set/sim_$(printf "%06d" $i)
    [ -f $sim/velo_000199.npz ] && continue
    rm -rf $sim
    python -u -m solver_in_the_loop_tpu burgers-gen -o burgers-fdt-hires-set -r 128 -l 32 \
        --dt 0.1 -s 30 -t 200 --seed $i --thumb || exit 1
  done'

run_stage b_gen_test -V burgers-fdt-hires-testset/sim_000004/velo_000199.npz -- bash -c '
  n=0
  for i in 100 101 102 103 104; do
    sim=burgers-fdt-hires-testset/sim_$(printf "%06d" $n)
    n=$((n+1))
    [ -f $sim/velo_000199.npz ] && continue
    rm -rf $sim
    python -u -m solver_in_the_loop_tpu burgers-gen -o burgers-fdt-hires-testset -r 128 -l 32 \
        --dt 0.1 -s 30 -t 200 --seed $i --thumb || exit 1
  done'

# --------------------------------------------------------------- burgers PRE
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

# Reference parity: burgers PRE trains the DEFAULT model (mars_moon) with NO
# --augment (/root/reference/burgers/Makefile:66-67 passes neither flag;
# jupiter_moon exists in the reference code but its Makefile workload does not
# select it — a jupiter_moon variant runs as a bonus stage at the end).
train_stage b_pre_train burgers-fdt-pre/tf b_pre_sim0 b_pre_sim1 b_pre_sim2 b_pre_sim3 b_pre_sim4 b_pre_sim5 b_pre_sim6 b_pre_sim7 b_pre_sim8 b_pre_sim9 -- \
  $PY burgers-pre-train -o burgers-fdt-pre/tf --seed 0 --val 0.05 --epochs 400 \
      'burgers-fdt-pre-set/sim_0*/'

run_stage b_pre_test -V burgers-fdt-pre/run_test/sim_000004/velTf_000199.npz b_pre_train b_gen_test -- bash -c '
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

run_stage b_eval_pre -V results_full_workload/eval_burgers_pre_seed104.json b_pre_test -- \
  python scripts/cpu_eval_batch.py b_eval pre burgers-fdt-pre/run_test

# -------------------------------------------- re-campaign at reference init
# Trainer defaults are now --init reference --clip-grad (BENCH.md "Init
# ablation": 2.3-2.6x better rollout MAE at 20 epochs). Retrain SOL-32 and
# NON, re-run tests, re-emit the main karman table.
train_stage k_sol32 karman-fdt-sol32/tf k_gen_train -- \
  $PY karman-train --tf karman-fdt-sol32/tf --log karman-fdt-sol32/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set

train_stage k_non karman-fdt-non/tf k_gen_train -- \
  $PY karman-train --tf karman-fdt-non/tf --log karman-fdt-non/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 1 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds

run_stage k_sol32_test -V karman-fdt-sol32/run_test/sim_000004/velTf_000499.npz k_sol32 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-sol32/run_test karman-fdt-sol32/tf/model.msgpack karman-fdt-sol32/tf/dataStats.json'
run_stage k_non_test -V karman-fdt-non/run_test/sim_000004/velTf_000499.npz k_non k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-non/run_test karman-fdt-non/tf/model.msgpack karman-fdt-non/tf/dataStats.json'
run_stage k_src_test -V karman-fdt-src/run_test/sim_000004/velTf_000499.npz k_sol32 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-src/run_test karman-fdt-sol32/tf/model.msgpack karman-fdt-sol32/tf/dataStats.json --no-model'

run_stage k_eval_sol32 -V results_full_workload/eval100_sol32_re3840000.json k_sol32_test -- \
  python scripts/cpu_eval_batch.py k_eval sol32 karman-fdt-sol32/run_test
run_stage k_eval_non -V results_full_workload/eval100_non_re3840000.json k_non_test -- \
  python scripts/cpu_eval_batch.py k_eval non karman-fdt-non/run_test
run_stage k_eval_src -V results_full_workload/eval100_src_re3840000.json k_src_test -- \
  python scripts/cpu_eval_batch.py k_eval src karman-fdt-src/run_test

# ----------------------------------------- burgers re-campaign at new default
train_stage b_sol04 burgers-fdt-sol04/tf b_gen_train -- \
  $PY burgers-train --tf burgers-fdt-sol04/tf --log burgers-fdt-sol04/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 4 -n 10 -b 5 --seed 0 \
      --train burgers-fdt-hires-set

train_stage b_non burgers-fdt-non/tf b_gen_train -- \
  $PY burgers-train --tf burgers-fdt-non/tf --log burgers-fdt-non/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 0 \
      --train burgers-fdt-hires-set --skip-ds

run_stage b_sol04_test -V burgers-fdt-sol04/run_test/sim_000004/velTf_000199.npz b_sol04 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-sol04/run_test burgers-fdt-sol04/tf/model.msgpack burgers-fdt-sol04/tf/dataStats.json'
run_stage b_non_test -V burgers-fdt-non/run_test/sim_000004/velTf_000199.npz b_non b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-non/run_test burgers-fdt-non/tf/model.msgpack burgers-fdt-non/tf/dataStats.json'
run_stage b_src_test -V burgers-fdt-src/run_test/sim_000004/velTf_000199.npz b_sol04 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-src/run_test burgers-fdt-sol04/tf/model.msgpack burgers-fdt-sol04/tf/dataStats.json --no-model'

run_stage b_eval_sol04 -V results_full_workload/eval_burgers_sol04_seed104.json b_sol04_test -- \
  python scripts/cpu_eval_batch.py b_eval sol04 burgers-fdt-sol04/run_test
run_stage b_eval_non -V results_full_workload/eval_burgers_non_seed104.json b_non_test -- \
  python scripts/cpu_eval_batch.py b_eval non burgers-fdt-non/run_test
run_stage b_eval_src -V results_full_workload/eval_burgers_src_seed104.json b_src_test -- \
  python scripts/cpu_eval_batch.py b_eval src burgers-fdt-src/run_test

# ---------------------------------------------------------- karman SOL-08
# tf2 Makefile variant (/root/reference/karman-2d-tf2/Makefile:56-58):
# msteps=8, otherwise identical to SOL-32. ~1/4 of SOL-32's step cost.
train_stage k_sol08 karman-fdt-sol08/tf k_gen_train -- \
  $PY karman-train --tf karman-fdt-sol08/tf --log karman-fdt-sol08/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 8 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set

run_stage k_sol08_test -V karman-fdt-sol08/run_test/sim_000004/velTf_000499.npz k_sol08 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-sol08/run_test karman-fdt-sol08/tf/model.msgpack karman-fdt-sol08/tf/dataStats.json'

run_stage k_eval_sol08 -V results_full_workload/eval100_sol08_re3840000.json k_sol08_test -- \
  python scripts/cpu_eval_batch.py k_eval sol08 karman-fdt-sol08/run_test

# ------------------------------------------------- lo-res source sets (parity)
run_stage k_lores_set -V karman-fdt-lores-set/sim_000005/velo_000499.npz k_gen_train -- bash -c '
  for i in 0 1 2 3 4 5; do
    re=$(( 10000 * (2**(i+4)) ))
    sim=karman-fdt-lores-set/sim_$(printf "%06d" $i)
    [ -f $sim/velo_000499.npz ] && continue
    rm -rf $sim
    python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-lores-set -r 32 -l 100 \
        --re $re --seed 0 --thumb --skipsteps 0 -t 500 -d 4 \
        --initdH karman-fdt-hires-set/sim_00000$i/dens_001000.npz \
        --initvH karman-fdt-hires-set/sim_00000$i/velo_001000.npz || exit 1
  done'
run_stage k_lores_testset -V karman-fdt-lores-testset/sim_000004/velo_000499.npz k_gen_test -- bash -c '
  for i in 0 1 2 3 4; do
    re=$(( 10000 * (2**(i+3)) * 3 ))
    sim=karman-fdt-lores-testset/sim_$(printf "%06d" $i)
    [ -f $sim/velo_000499.npz ] && continue
    rm -rf $sim
    python -u -m solver_in_the_loop_tpu karman-gen -o karman-fdt-lores-testset -r 32 -l 100 \
        --re $re --seed 0 --thumb --skipsteps 0 -t 500 -d 4 \
        --initdH karman-fdt-hires-testset/sim_00000$i/dens_001000.npz \
        --initvH karman-fdt-hires-testset/sim_00000$i/velo_001000.npz || exit 1
  done'

# ------------------------------------- bonus: burgers PRE with jupiter_moon
# Exercises the reference's burgers-PRE-specific architecture
# (/root/reference/burgers/burgers_train_pre.py:343-369) on real correction
# data; compared against the Makefile-default mars_moon PRE in BENCH.md.
train_stage b_pre_jm burgers-fdt-pre-jm/tf b_pre_sim9 -- \
  $PY burgers-pre-train -o burgers-fdt-pre-jm/tf --model jupiter_moon \
      --seed 0 --val 0.05 --epochs 400 'burgers-fdt-pre-set/sim_0*/'

run_stage b_pre_jm_test -V burgers-fdt-pre-jm/run_test/sim_000004/velTf_000199.npz b_pre_jm b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  rm -rf burgers-fdt-pre-jm/run_test
  for i in 0 1 2 3 4; do
    sim=$(printf "%06d" $i)
    $PY burgers-pre-apply -o burgers-fdt-pre-jm/run_test --arch jupiter_moon \
        --stats burgers-fdt-pre-jm/tf/stats.json --model burgers-fdt-pre-jm/tf/model.msgpack \
        --initvH burgers-fdt-hires-testset/sim_$sim/velo_000000.npz \
        --loadfH "burgers-fdt-hires-testset/sim_$sim/forc_0*.npz" \
        -d 4 -r 32 -l 32 --dt 0.1 -t 200 || exit 1
  done'

run_stage b_eval_pre_jm -V results_full_workload/eval_burgers_prejm_seed104.json b_pre_jm_test -- \
  python scripts/cpu_eval_batch.py b_eval prejm burgers-fdt-pre-jm/run_test

# -------------------------------------------------------------- final bench
run_stage final_bench -V runs/bench_queue.json -- bash -c '
  python bench.py | tee runs/bench_queue.json
  cp -f runs/bench_queue.json artifacts/ 2>/dev/null; true'


# ===================== round 4b: LeakyReLU-alpha-0.3 parity re-campaign =====
# networks.py round-4b parity fixes: LeakyReLU alpha = 0.3 (the Keras default
# the reference inherits, karman_train.py:105; rounds 1-4a used jax's 0.01)
# and the reference-exact jupiter_moon block (conv5x5+ReLU -> conv3x3 ->
# projected skip -> LeakyReLU, burgers_train_pre.py:343-369). The trainer CLI
# defaults changed, so every learned table row retrains at the new default;
# the alpha=0.01 campaign is archived to results_full_workload/r4a_alpha001/.
# Source-solver rows have no model and carry over unchanged.

run_stage conv_validate -T 3600 -V artifacts/perf/conv_validate.log -- bash -c '
  set -o pipefail
  mkdir -p artifacts/perf
  python -u scripts/validate_pallas_conv.py --iters 30 2>&1 | tee artifacts/perf/conv_validate.log'

# Lock in the conv-enabled hardware bench number immediately (round 4 lost
# its driver capture to the tunnel outage; don't let the long trains defer
# the round-5 headline to a deadline cut).
run_stage a3_early_bench -T 2400 -V runs/bench_a3.json -- bash -c '
  set -o pipefail
  SILT_BENCH_WAIT_S=60 python bench.py | tee runs/bench_a3.json || exit 1
  grep -q "\"stale\": true" runs/bench_a3.json && { rm -f runs/bench_a3.json; exit 1; }
  cp -f runs/bench_a3.json artifacts/ 2>/dev/null; true'

# Fused advection tap-sum kernel (round 5, VERDICT r4 next-step #6): validate
# on hardware and enable if it wins end-to-end. Gated exactly like conv_ok.
run_stage advect_validate -T 3600 -V artifacts/perf/advect_validate.log -- bash -c '
  set -o pipefail
  mkdir -p artifacts/perf
  python -u scripts/validate_pallas_advect.py --iters 30 2>&1 | tee artifacts/perf/advect_validate.log'

# Post-conv-decision step profile: where does the time go once the convs run
# in the Pallas kernels? (decides whether a fused advection kernel is the next
# lever — VERDICT r4 next-step #6)
run_stage a3_profile -T 1800 -V runs/profile_r5.log -- bash -c '
  python -u scripts/profile_step.py --by-name --iters 20 --out runs/profile_r5 \
    > runs/profile_r5.log 2>&1 || exit 1
  mkdir -p artifacts/perf && cp -f runs/profile_r5.log artifacts/perf/'

run_stage a3_archive -V results_full_workload/r4a_alpha001/eval100_sol32_re3840000.json -- bash -c '
  mkdir -p results_full_workload/r4a_alpha001
  cp -f results_full_workload/eval*.json results_full_workload/r4a_alpha001/'

# -------- karman headline: SOL-32 + NON
train_stage a3_k_sol32 karman-fdt-sol32-a3/tf k_gen_train -- \
  $PY karman-train --tf karman-fdt-sol32-a3/tf --log karman-fdt-sol32-a3/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set

run_stage a3_k_sol32_test -V karman-fdt-sol32-a3/run_test/sim_000004/velTf_000499.npz a3_k_sol32 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-sol32-a3/run_test karman-fdt-sol32-a3/tf/model.msgpack karman-fdt-sol32-a3/tf/dataStats.json'
run_stage a3_k_eval_sol32 a3_k_sol32_test a3_archive -- \
  python scripts/cpu_eval_batch.py k_eval sol32 karman-fdt-sol32-a3/run_test

train_stage a3_k_non karman-fdt-non-a3/tf k_gen_train -- \
  $PY karman-train --tf karman-fdt-non-a3/tf --log karman-fdt-non-a3/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 1 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set --skip-ds
run_stage a3_k_non_test -V karman-fdt-non-a3/run_test/sim_000004/velTf_000499.npz a3_k_non k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-non-a3/run_test karman-fdt-non-a3/tf/model.msgpack karman-fdt-non-a3/tf/dataStats.json'
run_stage a3_k_eval_non a3_k_non_test a3_archive -- \
  python scripts/cpu_eval_batch.py k_eval non karman-fdt-non-a3/run_test

# -------- burgers: SOL-04 + NON
train_stage a3_b_sol04 burgers-fdt-sol04-a3/tf b_gen_train -- \
  $PY burgers-train --tf burgers-fdt-sol04-a3/tf --log burgers-fdt-sol04-a3/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 4 -n 10 -b 5 --seed 0 \
      --train burgers-fdt-hires-set
run_stage a3_b_sol04_test -V burgers-fdt-sol04-a3/run_test/sim_000004/velTf_000199.npz a3_b_sol04 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-sol04-a3/run_test burgers-fdt-sol04-a3/tf/model.msgpack burgers-fdt-sol04-a3/tf/dataStats.json'
run_stage a3_b_eval_sol04 a3_b_sol04_test a3_archive -- \
  python scripts/cpu_eval_batch.py b_eval sol04 burgers-fdt-sol04-a3/run_test

train_stage a3_b_non burgers-fdt-non-a3/tf b_gen_train -- \
  $PY burgers-train --tf burgers-fdt-non-a3/tf --log burgers-fdt-non-a3/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 0 \
      --train burgers-fdt-hires-set --skip-ds
run_stage a3_b_non_test -V burgers-fdt-non-a3/run_test/sim_000004/velTf_000199.npz a3_b_non b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-non-a3/run_test burgers-fdt-non-a3/tf/model.msgpack burgers-fdt-non-a3/tf/dataStats.json'
run_stage a3_b_eval_non a3_b_non_test a3_archive -- \
  python scripts/cpu_eval_batch.py b_eval non burgers-fdt-non-a3/run_test

# -------- karman SOL-08 (tf2 Makefile variant)
train_stage a3_k_sol08 karman-fdt-sol08-a3/tf k_gen_train -- \
  $PY karman-train --tf karman-fdt-sol08-a3/tf --log karman-fdt-sol08-a3/tf/run.log \
      --epochs 100 --lr 0.0001 -l 100 -t 500 -s 4 -m 8 -n 6 -b 3 --seed 0 \
      --train karman-fdt-hires-set
run_stage a3_k_sol08_test -V karman-fdt-sol08-a3/run_test/sim_000004/velTf_000499.npz a3_k_sol08 k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  k_run_test karman-fdt-sol08-a3/run_test karman-fdt-sol08-a3/tf/model.msgpack karman-fdt-sol08-a3/tf/dataStats.json'
run_stage a3_k_eval_sol08 a3_k_sol08_test a3_archive -- \
  python scripts/cpu_eval_batch.py k_eval sol08 karman-fdt-sol08-a3/run_test

# -------- PRE family (correction datasets are model-free: reused as-is)
train_stage a3_k_pre karman-fdt-pre-a3/tf k_gen_train -- \
  $PY karman-pre-train -o karman-fdt-pre-a3/tf --seed 0 --val 0.05 --epochs 400 --augment \
      'karman-fdt-pre-set/sim_0*/'
run_stage a3_k_pre_test -V karman-fdt-pre-a3/run_test/sim_000004/velTf_000499.npz a3_k_pre k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; pre_run_test karman-fdt-pre-a3/run_test karman-fdt-pre-a3/tf'
run_stage a3_k_eval_pre a3_k_pre_test a3_archive -- \
  python scripts/cpu_eval_batch.py k_eval pre karman-fdt-pre-a3/run_test

train_stage a3_k_presr karman-fdt-presr-a3/tf k_presr_sim5 -- \
  $PY karman-pre-train -o karman-fdt-presr-a3/tf --seed 0 --val 0.05 --epochs 400 --augment \
      'karman-fdt-presr-set/sim_0*/'
run_stage a3_k_presr_test -V karman-fdt-presr-a3/run_test/sim_000004/velTf_000499.npz a3_k_presr k_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh; pre_run_test karman-fdt-presr-a3/run_test karman-fdt-presr-a3/tf'
run_stage a3_k_eval_presr a3_k_presr_test a3_archive -- \
  python scripts/cpu_eval_batch.py k_eval presr karman-fdt-presr-a3/run_test

train_stage a3_b_pre burgers-fdt-pre-a3/tf b_pre_sim9 -- \
  $PY burgers-pre-train -o burgers-fdt-pre-a3/tf --seed 0 --val 0.05 --epochs 400 \
      'burgers-fdt-pre-set/sim_0*/'
run_stage a3_b_pre_test -V burgers-fdt-pre-a3/run_test/sim_000004/velTf_000199.npz a3_b_pre b_gen_test -- \
  python -u scripts/apply_batch.py b_pre_run_test burgers-fdt-pre-a3/run_test burgers-fdt-pre-a3/tf
run_stage a3_b_eval_pre a3_b_pre_test a3_archive -- \
  python scripts/cpu_eval_batch.py b_eval pre burgers-fdt-pre-a3/run_test

# -------- bonus: jupiter_moon (now the reference-exact architecture)
train_stage a3_b_pre_jm burgers-fdt-pre-jm-a3/tf b_pre_sim9 -- \
  $PY burgers-pre-train -o burgers-fdt-pre-jm-a3/tf --model jupiter_moon \
      --seed 0 --val 0.05 --epochs 400 'burgers-fdt-pre-set/sim_0*/'
run_stage a3_b_pre_jm_test -V burgers-fdt-pre-jm-a3/run_test/sim_000004/velTf_000199.npz a3_b_pre_jm b_gen_test -- \
  python -u scripts/apply_batch.py b_pre_run_test burgers-fdt-pre-jm-a3/run_test burgers-fdt-pre-jm-a3/tf --arch jupiter_moon
run_stage a3_b_eval_pre_jm a3_b_pre_jm_test a3_archive -- \
  python scripts/cpu_eval_batch.py b_eval prejm burgers-fdt-pre-jm-a3/run_test

# -------- burgers SOL-vs-NON multi-seed adjudication (VERDICT r4 weak #4 /
# next-step #5): at alpha=0.01 the r4a table had NON beating SOL-04 on mean
# MAE across all 5 eval seeds; "seed noise" was asserted, not measured. Train
# 2 extra seeds per variant at the fixed alpha=0.3 default so BENCH.md can
# report mean±std over 3 *training* seeds (reference claim at stake:
# /root/reference/README.md:12). Interleaved sol/non by seed so a deadline
# cut still leaves matched pairs.
train_stage a3_b_sol04_s1 burgers-fdt-sol04-a3s1/tf a3_b_sol04 -- \
  $PY burgers-train --tf burgers-fdt-sol04-a3s1/tf --log burgers-fdt-sol04-a3s1/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 4 -n 10 -b 5 --seed 1 \
      --train burgers-fdt-hires-set --skip-ds
run_stage a3_b_sol04_s1_test -V burgers-fdt-sol04-a3s1/run_test/sim_000004/velTf_000199.npz a3_b_sol04_s1 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-sol04-a3s1/run_test burgers-fdt-sol04-a3s1/tf/model.msgpack burgers-fdt-sol04-a3s1/tf/dataStats.json'
run_stage a3_b_eval_sol04_s1 a3_b_sol04_s1_test -- \
  python scripts/cpu_eval_batch.py b_eval sol04_s1 burgers-fdt-sol04-a3s1/run_test

train_stage a3_b_non_s1 burgers-fdt-non-a3s1/tf a3_b_non -- \
  $PY burgers-train --tf burgers-fdt-non-a3s1/tf --log burgers-fdt-non-a3s1/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 1 \
      --train burgers-fdt-hires-set --skip-ds
run_stage a3_b_non_s1_test -V burgers-fdt-non-a3s1/run_test/sim_000004/velTf_000199.npz a3_b_non_s1 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-non-a3s1/run_test burgers-fdt-non-a3s1/tf/model.msgpack burgers-fdt-non-a3s1/tf/dataStats.json'
run_stage a3_b_eval_non_s1 a3_b_non_s1_test -- \
  python scripts/cpu_eval_batch.py b_eval non_s1 burgers-fdt-non-a3s1/run_test

train_stage a3_b_sol04_s2 burgers-fdt-sol04-a3s2/tf a3_b_sol04 -- \
  $PY burgers-train --tf burgers-fdt-sol04-a3s2/tf --log burgers-fdt-sol04-a3s2/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 4 -n 10 -b 5 --seed 2 \
      --train burgers-fdt-hires-set --skip-ds
run_stage a3_b_sol04_s2_test -V burgers-fdt-sol04-a3s2/run_test/sim_000004/velTf_000199.npz a3_b_sol04_s2 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-sol04-a3s2/run_test burgers-fdt-sol04-a3s2/tf/model.msgpack burgers-fdt-sol04-a3s2/tf/dataStats.json'
run_stage a3_b_eval_sol04_s2 a3_b_sol04_s2_test -- \
  python scripts/cpu_eval_batch.py b_eval sol04_s2 burgers-fdt-sol04-a3s2/run_test

train_stage a3_b_non_s2 burgers-fdt-non-a3s2/tf a3_b_non -- \
  $PY burgers-train --tf burgers-fdt-non-a3s2/tf --log burgers-fdt-non-a3s2/tf/run.log \
      --epochs 100 --lr 0.0001 --dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 2 \
      --train burgers-fdt-hires-set --skip-ds
run_stage a3_b_non_s2_test -V burgers-fdt-non-a3s2/run_test/sim_000004/velTf_000199.npz a3_b_non_s2 b_gen_test -- bash -c '
  source scripts/round2_queue_lib.sh
  b_run_test burgers-fdt-non-a3s2/run_test burgers-fdt-non-a3s2/tf/model.msgpack burgers-fdt-non-a3s2/tf/dataStats.json'
run_stage a3_b_eval_non_s2 a3_b_non_s2_test -- \
  python scripts/cpu_eval_batch.py b_eval non_s2 burgers-fdt-non-a3s2/run_test

# -------- final bench (post-campaign; own file so a stale emission can never
# clobber the early capture, and a stale result fails the stage so it retries)
run_stage a3_final_bench -V runs/bench_a3_final.json -- bash -c '
  set -o pipefail
  SILT_BENCH_WAIT_S=300 python bench.py | tee runs/bench_a3_final.tmp || exit 1
  grep -q "\"stale\": true" runs/bench_a3_final.tmp && { rm -f runs/bench_a3_final.tmp; exit 1; }
  mv runs/bench_a3_final.tmp runs/bench_a3_final.json
  cp -f runs/bench_a3_final.json runs/bench_a3.json
  cp -f runs/bench_a3_final.json artifacts/bench_a3.json 2>/dev/null; true'

note "QUEUE COMPLETE"
