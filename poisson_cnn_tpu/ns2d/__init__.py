from .mesh import (
    MACGrid,
    Problem,
    taylor_vortex,
    driven_cavity,
    periodic_forcing_1,
    periodic_forcing_2,
)
from .operators import (
    complete_u,
    complete_v,
    convection,
    divergence,
    grad_p_faces,
    laplacian_u,
    laplacian_v,
    helmholtz_solve_u,
    helmholtz_solve_v,
)
from .stepper import (
    NSConfig,
    cg_pressure_solver,
    cnn_pressure_initializer,
    coarse_residual_corrected_initializer,
    dct_pressure_solver,
    initial_state,
    make_stepper,
    run,
)
from .errors import velocity_error, pressure_error, convergence_rates
from .errors import pressure_gradient_error, integrate_centered
