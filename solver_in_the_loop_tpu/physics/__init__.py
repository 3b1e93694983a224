from solver_in_the_loop_tpu.physics.karman import KarmanFlow  # noqa: F401
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, SinPotentialForce  # noqa: F401
