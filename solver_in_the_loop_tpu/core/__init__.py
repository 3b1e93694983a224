from solver_in_the_loop_tpu.core.grids import (  # noqa: F401
    Boundary,
    CenteredGrid,
    Domain,
    StaggeredGrid,
)
