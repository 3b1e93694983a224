# Shared helpers for scripts/round2_queue.sh stage subshells.
# Sourced by every `bash -c` stage body; keep it dependency-free.

cd /root/repo || exit 1
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
PY="python -u -m solver_in_the_loop_tpu"
RES=results_full_workload

test_re() { echo $(( 10000 * (2**($1+3)) * 3 )); }   # 240k 480k 960k 1.92M 3.84M

k_run_test() {  # k_run_test OUTDIR MODEL STATS [EXTRA]
  # one process for all 5 rollouts: each fresh python pays a 1-3 min tunnel
  # startup stall (scripts/apply_batch.py; same CLI argv per rollout)
  python -u scripts/apply_batch.py k_run_test "$@" || return 1
}

k_eval() {  # k_eval TAG RUNDIR
  local i re
  for i in 0 1 2 3 4; do
    re=$(test_re $i)
    $PY evaluate --run "$2/sim_00000$i" --ref karman-fdt-hires-testset/sim_00000$i \
        --ref-offset 1000 --scale 4 --steps 499 > "$RES/eval_$1_re$re.json" || return 1
    $PY evaluate --run "$2/sim_00000$i" --ref karman-fdt-hires-testset/sim_00000$i \
        --ref-offset 1000 --scale 4 --steps 100 > "$RES/eval100_$1_re$re.json" || return 1
  done
}

abl_eval() {  # abl_eval TAG  — 500-step rollout on held-out Re=480k
  rm -rf "runs/$1/run_test"
  $PY karman-apply -o "runs/$1/run_test" --stats "runs/$1/tf/dataStats.json" \
      --model "runs/$1/tf/model.msgpack" \
      --initdH karman-fdt-hires-testset/sim_000001/dens_001000.npz \
      --initvH karman-fdt-hires-testset/sim_000001/velo_001000.npz \
      -d 4 -r 32 -l 100 --re 480000 -t 500 || return 1
  $PY evaluate --run "runs/$1/run_test/sim_000000" --ref karman-fdt-hires-testset/sim_000001 \
      --ref-offset 1000 --scale 4 --steps 499 > "$RES/eval_$1_re480000.json"
}

pre_gen() {  # pre_gen OUTDIR BETA
  rm -rf "$1"
  local i re
  for i in 0 1 2 3 4 5; do
    re=$(( 10000 * (2**(i+4)) ))
    $PY karman-pre-gen -o "$1" -r 32 -l 100 --re $re --seed 0 --beta "$2" || return 1
  done
}

pre_run_test() {  # pre_run_test OUTDIR TFDIR
  python -u scripts/apply_batch.py pre_run_test "$@" || return 1
}

b_run_test() {  # b_run_test OUTDIR MODEL STATS [EXTRA]
  python -u scripts/apply_batch.py b_run_test "$@" || return 1
}

b_eval() {  # b_eval TAG RUNDIR  — 199-step rollout MAE per held-out seed
  local i sim seed
  for i in 0 1 2 3 4; do
    sim=$(printf '%06d' $i); seed=$((100+i))
    $PY evaluate --run "$2/sim_$sim" --ref burgers-fdt-hires-testset/sim_$sim \
        --ref-offset 0 --scale 4 --steps 199 --field velTf \
        > "$RES/eval_burgers_$1_seed$seed.json" || return 1
  done
}
