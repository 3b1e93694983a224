from solver_in_the_loop_tpu.models.networks import (  # noqa: F401
    MarsMoon,
    Mercury,
    JupiterMoon,
    build_model,
)
