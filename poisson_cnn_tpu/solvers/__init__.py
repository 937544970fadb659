from .spectral import (
    poisson_solve,
    poisson_solve_dirichlet,
    poisson_solve_neumann,
    poisson_solve_neumann_vertex,
    lift_dirichlet_boundaries,
    apply_dirichlet_boundaries,
)
from .iterative import (
    laplacian_dirichlet,
    jacobi_smooth,
    conjugate_gradient,
)
from .multigrid import multigrid_poisson_solve
from .direct import cholesky_poisson_solve
from .variable_density import (
    variable_density_operator,
    variable_density_poisson_solve,
)
