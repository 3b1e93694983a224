from solver_in_the_loop_tpu.ops.advection import semi_lagrangian  # noqa: F401
from solver_in_the_loop_tpu.ops.diffusion import diffuse_explicit, diffuse_explicit_grid  # noqa: F401
from solver_in_the_loop_tpu.ops.stencils import divergence, laplacian, pressure_gradient  # noqa: F401
