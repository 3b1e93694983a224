from solver_in_the_loop_tpu.io.scene import Scene  # noqa: F401
