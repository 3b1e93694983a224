# ---------------------------------------------------------------------------
# Reference-parity workload DAG (karman-2d + burgers), TPU-native CLI.
# Mirrors every target of the reference Makefiles
# (/root/reference/karman-2d/Makefile, /root/reference/burgers/Makefile) with
# identical hyperparameters; sequential shell sweeps become batched runs where
# the TPU build supports it (multiple --re values in one rollout).
# ---------------------------------------------------------------------------

SHELL := /bin/bash
PY := python -u -m solver_in_the_loop_tpu

.PHONY: test bench

test:
	python -m pytest tests/ -q

bench:
	python -u bench.py

# ############################################################################
# karman-2d

# training set: 6 sims, Re = 10000*2^(i+4), hi-res 256x128, frames 1000..1499
# (reference loops the 6 Re's sequentially; here they run batched in one sim)
karman-fdt-hires-set:
	$(PY) karman-gen -o $@ -r 128 -l 100 --seed 0 --thumb \
		--re 160000 320000 640000 1280000 2560000 5120000

# test set: 5 sims, Re = 10000*2^(i+3)*3
karman-fdt-hires-testset:
	$(PY) karman-gen -o $@ -r 128 -l 100 --seed 0 --thumb \
		--re 240000 480000 960000 1920000 3840000

# lo-res source runs (not used for training)
karman-fdt-lores-set: karman-fdt-hires-set
	for i in 0 1 2 3 4 5; do \
		re=$$(( 10000 * 2**($$i+4) )); \
		$(PY) karman-gen -o $@ -r 32 -l 100 --re $$re --seed 0 --thumb \
			--skipsteps 0 -t 500 -d 4 \
			--initdH karman-fdt-hires-set/sim_00000$$i/dens_001000.npz \
			--initvH karman-fdt-hires-set/sim_00000$$i/velo_001000.npz; \
	done

# lo-res source runs of the TEST Re's (reference karman-2d/Makefile:40-46)
karman-fdt-lores-testset: karman-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		re=$$(( 10000 * 2**($$i+3) * 3 )); \
		$(PY) karman-gen -o $@ -r 32 -l 100 --re $$re --seed 0 --thumb \
			--skipsteps 0 -t 500 -d 4 \
			--initdH karman-fdt-hires-testset/sim_00000$$i/dens_001000.npz \
			--initvH karman-fdt-hires-testset/sim_00000$$i/velo_001000.npz; \
	done

# PRE data (per-step constrained least-squares corrections)
karman-fdt-pre-set:
	for i in 0 1 2 3 4 5; do \
		re=$$(( 10000 * 2**($$i+4) )); \
		$(PY) karman-pre-gen -o $@ -r 32 -l 100 --re $$re --seed 0 --beta 1.0; \
	done

karman-fdt-presr-set:
	rm -rf $@ && for i in 0 1 2 3 4 5; do \
		re=$$(( 10000 * 2**($$i+4) )); \
		$(PY) karman-pre-gen -o $@ -r 32 -l 100 --re $$re --seed 0 --beta 0; \
	done

# PRE / PRE-SR supervised training (400 epochs, val 5%, flip augmentation)
karman-fdt-pre:
	$(PY) karman-pre-train -o $@/tf --seed 0 --val 0.05 --epochs 400 --augment \
		karman-fdt-pre-set/sim_0*/

karman-fdt-presr:
	$(PY) karman-pre-train -o $@/tf --seed 0 --val 0.05 --epochs 400 --augment \
		karman-fdt-presr-set/sim_0*/

# NON (msteps=1) and SOL-32 trainings
karman-fdt-non:
	$(PY) karman-train --tf $@/tf --log $@/tf/run.log --epochs 100 --lr 0.0001 \
		-l 100 -t 500 -s 4 -m 1 -n 6 -b 3 --seed 0 --train karman-fdt-hires-set

karman-fdt-sol32:
	$(PY) karman-train --tf $@/tf --log $@/tf/run.log --epochs 100 --lr 0.0001 \
		-l 100 -t 500 -s 4 -m 32 -n 6 -b 3 --seed 0 --train karman-fdt-hires-set

# SOL-08 (reference karman-2d-tf2/Makefile:56-58)
karman-fdt-sol08:
	$(PY) karman-train --tf $@/tf --log $@/tf/run.log --epochs 100 --lr 0.0001 \
		-l 100 -t 500 -s 4 -m 8 -n 6 -b 3 --seed 0 --train karman-fdt-hires-set

# test rollouts: 500 steps x 5 unseen Re (batched in one rollout)
karman-fdt-sol32/run_test: karman-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		re=$$(( 10000 * 2**($$i+3) * 3 )); \
		$(PY) karman-apply -o $@ --stats karman-fdt-sol32/tf/dataStats.json \
			--model karman-fdt-sol32/tf/model.msgpack \
			--initdH karman-fdt-hires-testset/sim_00000$$i/dens_001000.npz \
			--initvH karman-fdt-hires-testset/sim_00000$$i/velo_001000.npz \
			-d 4 -r 32 -l 100 --re $$re -t 500; \
	done

karman-fdt-non/run_test: karman-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		re=$$(( 10000 * 2**($$i+3) * 3 )); \
		$(PY) karman-apply -o $@ --stats karman-fdt-non/tf/dataStats.json \
			--model karman-fdt-non/tf/model.msgpack \
			--initdH karman-fdt-hires-testset/sim_00000$$i/dens_001000.npz \
			--initvH karman-fdt-hires-testset/sim_00000$$i/velo_001000.npz \
			-d 4 -r 32 -l 100 --re $$re -t 500; \
	done

karman-fdt-pre/run_test: karman-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		re=$$(( 10000 * 2**($$i+3) * 3 )); \
		$(PY) karman-pre-apply -o $@ --stats karman-fdt-pre/tf/stats.json \
			--model karman-fdt-pre/tf/model.msgpack \
			--initdH karman-fdt-hires-testset/sim_00000$$i/dens_001000.npz \
			--initvH karman-fdt-hires-testset/sim_00000$$i/velo_001000.npz \
			-d 4 -r 32 -l 100 --re $$re -t 500; \
	done

# ############################################################################
# burgers

# training set: 10 sims (seeds 0-9), 128^2, dt=0.1, skip 30, 200 frames
burgers-fdt-hires-set:
	for i in 0 1 2 3 4 5 6 7 8 9; do \
		$(PY) burgers-gen -o $@ -r 128 -l 32 --dt 0.1 -s 30 -t 200 --seed $$i --thumb; \
	done

# test set: 5 sims (seeds 100-104)
burgers-fdt-hires-testset:
	for i in 100 101 102 103 104; do \
		$(PY) burgers-gen -o $@ -r 128 -l 32 --dt 0.1 -s 30 -t 200 --seed $$i --thumb; \
	done

burgers-fdt-pre-set: burgers-fdt-hires-set
	for i in 0 1 2 3 4 5 6 7 8 9; do \
		$(PY) burgers-pre-gen -o $@ -r 32 -l 32 --dt 0.1 -t 200 --beta 1.0 \
			--initvH burgers-fdt-hires-set/sim_$$(printf '%06d' $$i)/velo_000000.npz \
			--loadfH "burgers-fdt-hires-set/sim_$$(printf '%06d' $$i)/forc_0*.npz"; \
	done

burgers-fdt-pre:
	$(PY) burgers-pre-train -o $@/tf --seed 0 --val 0.05 --epochs 400 --augment \
		burgers-fdt-pre-set/sim_0*/

# NON (msteps=1) and SOL-04 trainings
burgers-fdt-non:
	$(PY) burgers-train --tf $@/tf --log $@/tf/run.log --epochs 100 --lr 0.0001 \
		--dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 0 --train burgers-fdt-hires-set

burgers-fdt-sol04:
	$(PY) burgers-train --tf $@/tf --log $@/tf/run.log --epochs 100 --lr 0.0001 \
		--dt 0.1 -t 200 -s 4 -m 4 -n 10 -b 5 --seed 0 --train burgers-fdt-hires-set

burgers-fdt-sol04/run_test: burgers-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		sim=$$(printf '%06d' $$i); \
		$(PY) burgers-apply -o $@ --stats burgers-fdt-sol04/tf/dataStats.json \
			--model burgers-fdt-sol04/tf/model.msgpack \
			--initvH burgers-fdt-hires-testset/sim_$$sim/velo_000000.npz \
			--loadfH "burgers-fdt-hires-testset/sim_$$sim/forc_0*.npz" \
			-d 4 -r 32 -l 32 --dt 0.1 -t 200; \
	done

burgers-fdt-non/run_test: burgers-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		sim=$$(printf '%06d' $$i); \
		$(PY) burgers-apply -o $@ --stats burgers-fdt-non/tf/dataStats.json \
			--model burgers-fdt-non/tf/model.msgpack \
			--initvH burgers-fdt-hires-testset/sim_$$sim/velo_000000.npz \
			--loadfH "burgers-fdt-hires-testset/sim_$$sim/forc_0*.npz" \
			-d 4 -r 32 -l 32 --dt 0.1 -t 200; \
	done
