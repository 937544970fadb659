"""Equivalents of the reference's `poisson_CNN/misc/` orphans.

`conv_laplacian_loss` and `variable_density` already live on first-class paths
(`losses.conv_laplacian`, `solvers.variable_density`); this subpackage holds
the remaining one: the curved-boundary machinery (`misc/Boundary.py`).
"""

from .boundary import Boundary1D, natural_cubic_spline, SplineCurve

__all__ = ["Boundary1D", "natural_cubic_spline", "SplineCurve"]
