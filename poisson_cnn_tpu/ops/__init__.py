from .fd import (
    fd_coefficients,
    fd_stencil_1d,
    build_fd_stencil,
    apply_fd_operator,
    laplacian_fd,
)
from .grids import (
    compute_domain_sizes,
    unit_coordinates,
    cos_position_embeddings,
    make_shape_mask,
)
from .magnitude import (
    peak_magnitudes,
    set_max_magnitude_in_batch,
    set_max_magnitude_in_batch_and_return_scaling_factors,
)
from .rotate import rot90, flip
from .quadrature import (
    gauss_legendre,
    linear_interp_matrix,
    integrate_on_grid,
    integral_lp_error,
)
from .smooth import (
    trig_bases,
    random_series_coefficients,
    synthesize_series,
    laplacian_eigenvalue_factors,
)
from .resize import resize_matrix, resize_align_corners
from .pallas_kernels import jacobi_smooth_pallas, jacobi_smooth_auto
from .polynomial import (
    roots_to_coefficients,
    polynomial_derivative_coefficients,
    polyval_on_unit_grid,
    random_polynomials_and_second_derivatives,
)
