# ---------------------------------------------------------------------------
# Reference-parity workload DAG (karman-2d + burgers), TPU-native CLI.
# Mirrors EVERY target of the five reference Makefiles with identical
# hyperparameters; sequential shell sweeps become batched runs where the TPU
# build supports it (multiple --re values in one rollout).
#
# Reference target -> repo target map (the tf2/phi2 trees re-run the tf1
# workloads on a different backend; this repo has ONE backend, so their
# targets collapse onto the same names):
#   karman-2d/Makefile        all 14 targets      -> same names below
#   burgers/Makefile          all 11 targets      -> same names below
#   karman-2d-tf2/Makefile    hires/lores sets, non(+run_test) -> same names;
#                             karman-fdt-sol08(/run_test)      -> same names
#   karman-2d-phi2/Makefile   sets + sol08(/run_test)          -> same names
#   burgers-tf2/Makefile      forced targets -> same names; --noforce family
#                             burgers-nof-fdt-{hires-set,hires-testset,
#                             non,sol04}                       -> same names
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

# PRE-SR (beta=0) rollouts (reference karman-2d/Makefile:97-106)
karman-fdt-presr/run_test: karman-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		re=$$(( 10000 * 2**($$i+3) * 3 )); \
		$(PY) karman-pre-apply -o $@ --stats karman-fdt-presr/tf/stats.json \
			--model karman-fdt-presr/tf/model.msgpack \
			--initdH karman-fdt-hires-testset/sim_00000$$i/dens_001000.npz \
			--initvH karman-fdt-hires-testset/sim_00000$$i/velo_001000.npz \
			-d 4 -r 32 -l 100 --re $$re -t 500; \
	done

# SOL-08 rollouts (reference karman-2d-tf2/Makefile:76-84)
karman-fdt-sol08/run_test: karman-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		re=$$(( 10000 * 2**($$i+3) * 3 )); \
		$(PY) karman-apply -o $@ --stats karman-fdt-sol08/tf/dataStats.json \
			--model karman-fdt-sol08/tf/model.msgpack \
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

# --noforce family (reference burgers-tf2/Makefile:25-39,69-80)
burgers-nof-fdt-hires-set:
	for i in 0 1 2 3 4 5 6 7 8 9; do \
		$(PY) burgers-gen -o $@ -r 128 -l 32 --dt 0.1 -s 30 -t 200 --seed $$i --noforce --thumb; \
	done

burgers-nof-fdt-hires-testset:
	for i in 100 101 102 103 104; do \
		$(PY) burgers-gen -o $@ -r 128 -l 32 --dt 0.1 -s 30 -t 200 --seed $$i --noforce --thumb; \
	done

# lo-res source runs, forces replayed from the downsampled hi-res runs
# (reference burgers/Makefile:35-52; not used for training)
burgers-fdt-lores-set: burgers-fdt-hires-set
	for i in 0 1 2 3 4 5 6 7 8 9; do \
		sim=$$(printf '%06d' $$i); \
		$(PY) burgers-gen -o $@ -r 32 -l 32 --dt 0.1 -s 0 -t 200 -d 4 --seed $$i --thumb \
			--initvH burgers-fdt-hires-set/sim_$$sim/velo_000000.npz \
			--loadfH "burgers-fdt-hires-set/sim_$$sim/forc_0*.npz"; \
	done

burgers-fdt-lores-testset: burgers-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		sim=$$(printf '%06d' $$i); \
		$(PY) burgers-gen -o $@ -r 32 -l 32 --dt 0.1 -s 0 -t 200 -d 4 --seed 10$$i --thumb \
			--initvH burgers-fdt-hires-testset/sim_$$sim/velo_000000.npz \
			--loadfH "burgers-fdt-hires-testset/sim_$$sim/forc_0*.npz"; \
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

# --noforce variants: trained on the FORCED data, features without force
# channels (reference burgers-tf2/Makefile:69-80 passes the forced hires set)
burgers-nof-fdt-non:
	$(PY) burgers-train --tf $@/tf --log $@/tf/run.log --epochs 100 --lr 0.0001 \
		--dt 0.1 -t 200 -s 4 -m 1 -n 10 -b 5 --seed 0 --noforce --train burgers-fdt-hires-set

burgers-nof-fdt-sol04:
	$(PY) burgers-train --tf $@/tf --log $@/tf/run.log --epochs 100 --lr 0.0001 \
		--dt 0.1 -t 200 -s 4 -m 4 -n 10 -b 5 --seed 0 --noforce --train burgers-fdt-hires-set

# PRE rollouts (reference burgers/Makefile:83-93)
burgers-fdt-pre/run_test: burgers-fdt-hires-testset
	for i in 0 1 2 3 4; do \
		sim=$$(printf '%06d' $$i); \
		$(PY) burgers-pre-apply -o $@ --stats burgers-fdt-pre/tf/stats.json \
			--model burgers-fdt-pre/tf/model.msgpack \
			--initvH burgers-fdt-hires-testset/sim_$$sim/velo_000000.npz \
			--loadfH "burgers-fdt-hires-testset/sim_$$sim/forc_0*.npz" \
			-d 4 -r 32 -l 32 --dt 0.1 -t 200; \
	done

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
