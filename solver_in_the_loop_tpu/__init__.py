"""solver_in_the_loop_tpu — TPU-native differentiable-PDE "solver in the loop" framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tum-pbs/Solver-in-the-Loop (NeurIPS 2020): differentiable staggered-grid fluid
solvers (semi-Lagrangian advection, explicit diffusion, masked pressure
projection), unrolled "solver-in-the-loop" training of convolutional correction
networks, PRE (pre-computed correction) pipelines, and Scene-compatible npz I/O.

Layer map (cf. /root/repo/SURVEY.md §1):
  core      — pytree grid types (CenteredGrid / StaggeredGrid / Domain), resampling
  ops       — stencil & advection ops, matrix-free Poisson CG (+ Pallas kernels)
  physics   — KarmanFlow / Burgers scenario steps as pure functions
  models    — correction networks (mercury / mars_moon / jupiter_moon)
  train     — datasets, unrolled SOL/NON training, PRE supervised training
  parallel  — device mesh + data-parallel sharding helpers
  io        — Scene npz I/O compatible with the reference on-disk layout
  pre       — PRE constrained-least-squares correction data generation
  apps      — CLI entry points replicating the reference Makefile targets
"""

__version__ = "0.1.0"

from solver_in_the_loop_tpu.core.grids import (  # noqa: F401
    Boundary,
    CenteredGrid,
    Domain,
    StaggeredGrid,
)
