"""MAC staggered mesh and benchmark problems for the 2-D Navier–Stokes solver.

Capability parity with `Navier_Stokes_2D/structure.py`:
- `mesh` (`structure.py:20-115`): staggered grid with u on vertical (x-) faces,
  v on horizontal (y-) faces, p at cell centers; CFL-based timestep.
- problem definitions (`structure.py:249-539`): lid-driven cavity and the
  decaying Taylor(-Green) vortex with exact time-dependent boundary data,
  initial conditions and exact solutions for error analysis.

Layout: u (m+1, n) at x_i = x0 + i*dx, y centers; v (m, n+1); p (m, n).
Everything is a plain pure function of (x, y, t) so the jitted stepper can
evaluate boundary data at any timestep without host callbacks.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MACGrid:
    m: int  # cells in x
    n: int  # cells in y
    x0: float = 0.0
    x1: float = math.pi
    y0: float = 0.0
    y1: float = math.pi

    @property
    def dx(self) -> float:
        return (self.x1 - self.x0) / self.m

    @property
    def dy(self) -> float:
        return (self.y1 - self.y0) / self.n

    # coordinate arrays (numpy — static, used at trace time)
    @property
    def xu(self):  # x of u-faces (m+1,)
        return np.linspace(self.x0, self.x1, self.m + 1)

    @property
    def yu(self):  # y of u-points = cell centers (n,)
        return self.y0 + (np.arange(self.n) + 0.5) * self.dy

    @property
    def xv(self):  # x of v-points = cell centers (m,)
        return self.x0 + (np.arange(self.m) + 0.5) * self.dx

    @property
    def yv(self):  # y of v-faces (n+1,)
        return np.linspace(self.y0, self.y1, self.n + 1)

    @property
    def xp(self):
        return self.xv

    @property
    def yp(self):
        return self.yu

    def cfl_dt(self, u_max: float, Re: float, cfl: float = 0.5) -> float:
        """CFL-limited dt combining convection and diffusion limits
        (reference `structure.py:33-37`)."""
        h = min(self.dx, self.dy)
        conv = cfl * h / max(u_max, 1e-12)
        diff = 0.25 * Re * h**2
        return min(conv, diff)


@dataclasses.dataclass(frozen=True)
class Problem:
    """A benchmark problem: velocity BCs, ICs, optional forcing + exact fields.

    All callables are (x, y, t) -> value with x, y broadcastable jnp arrays;
    BC functions are evaluated on each wall's own coordinates.
    """

    name: str
    u_bc: Callable  # (x, y, t) -> u on boundary
    v_bc: Callable
    u_init: Callable
    v_init: Callable
    forcing_u: Optional[Callable] = None
    forcing_v: Optional[Callable] = None
    u_exact: Optional[Callable] = None
    v_exact: Optional[Callable] = None
    p_exact: Optional[Callable] = None


def taylor_vortex(Re: float = 1.0) -> Problem:
    """Decaying Taylor(-Green) vortex (reference `structure.py:287-305,657-678`):
    u = -cos(x) sin(y) e^(-2t/Re), v = sin(x) cos(y) e^(-2t/Re),
    p = -(cos(2x) + cos(2y))/4 e^(-4t/Re). Exact NS solution; Dirichlet BCs
    from the exact fields."""

    def u_exact(x, y, t):
        return -jnp.cos(x) * jnp.sin(y) * jnp.exp(-2.0 * t / Re)

    def v_exact(x, y, t):
        return jnp.sin(x) * jnp.cos(y) * jnp.exp(-2.0 * t / Re)

    def p_exact(x, y, t):
        return -0.25 * (jnp.cos(2 * x) + jnp.cos(2 * y)) * jnp.exp(-4.0 * t / Re)

    return Problem(
        name="taylor",
        u_bc=u_exact,
        v_bc=v_exact,
        u_init=lambda x, y: u_exact(x, y, 0.0),
        v_init=lambda x, y: v_exact(x, y, 0.0),
        u_exact=u_exact,
        v_exact=v_exact,
        p_exact=p_exact,
    )


def driven_cavity(lid_velocity: float = 1.0, y_top: float = math.pi) -> Problem:
    """Lid-driven cavity (reference `structure.py:274-284`): no-slip walls, the
    lid (y = y_top, the grid's y1) moves with u = lid_velocity."""

    def u_bc(x, y, t):
        lid = jnp.abs(y - y_top) < 1e-9
        return jnp.where(lid, lid_velocity, 0.0) * jnp.ones_like(x)

    def v_bc(x, y, t):
        return jnp.zeros_like(x + y)

    return Problem(
        name="driven_cavity",
        u_bc=u_bc,
        v_bc=v_bc,
        u_init=lambda x, y: jnp.zeros_like(x + y),
        v_init=lambda x, y: jnp.zeros_like(x + y),
    )


def periodic_forcing_1(Re: float = 1.0) -> Problem:
    """Forced linearized-NS problem 1 (reference `structure.py:306-324,688-698`,
    forcing `structure.py:713-760`): exact fields
    u = pi sin(t) sin(2 pi y) sin^2(pi x), v = -pi sin(t) sin(2 pi x) sin^2(pi y),
    p = sin(t) sin(pi y) cos(pi x); forcing F = u_t - (1/Re) lap(u) + grad(p)
    (run with NSConfig(linearized=True))."""
    pi = math.pi

    def u_exact(x, y, t):
        return pi * jnp.sin(t) * jnp.sin(2 * pi * y) * jnp.sin(pi * x) ** 2

    def v_exact(x, y, t):
        return -pi * jnp.sin(t) * jnp.sin(2 * pi * x) * jnp.sin(pi * y) ** 2

    def p_exact(x, y, t):
        return jnp.sin(t) * jnp.sin(pi * y) * jnp.cos(pi * x)

    def forcing_u(x, y, t):
        u_t = pi * jnp.cos(t) * jnp.sin(2 * pi * y) * jnp.sin(pi * x) ** 2
        lap = (
            2 * pi**3 * jnp.sin(t) * jnp.sin(2 * pi * y)
            * (jnp.cos(2 * pi * x) - 2 * jnp.sin(pi * x) ** 2)
        )
        dp_dx = -pi * jnp.sin(t) * jnp.sin(pi * y) * jnp.sin(pi * x)
        return u_t - lap / Re + dp_dx

    def forcing_v(x, y, t):
        v_t = -pi * jnp.cos(t) * jnp.sin(2 * pi * x) * jnp.sin(pi * y) ** 2
        lap = (
            -2 * pi**3 * jnp.sin(t) * jnp.sin(2 * pi * x)
            * (jnp.cos(2 * pi * y) - 2 * jnp.sin(pi * y) ** 2)
        )
        dp_dy = pi * jnp.sin(t) * jnp.cos(pi * y) * jnp.cos(pi * x)
        return v_t - lap / Re + dp_dy

    return Problem(
        name="periodic_forcing_1",
        u_bc=u_exact,
        v_bc=v_exact,
        u_init=lambda x, y: u_exact(x, y, 0.0),
        v_init=lambda x, y: v_exact(x, y, 0.0),
        forcing_u=forcing_u,
        forcing_v=forcing_v,
        u_exact=u_exact,
        v_exact=v_exact,
        p_exact=p_exact,
    )


def periodic_forcing_2(Re: float = 1.0) -> Problem:
    """Forced linearized-NS problem 2 (reference `structure.py:326-345,700-712`):
    u = sin(x+t) sin(y+t), v = cos(x+t) cos(y+t), p = sin(x - y + t);
    lap(u) = -2u, lap(v) = -2v (run with NSConfig(linearized=True))."""

    def u_exact(x, y, t):
        return jnp.sin(x + t) * jnp.sin(y + t)

    def v_exact(x, y, t):
        return jnp.cos(x + t) * jnp.cos(y + t)

    def p_exact(x, y, t):
        return jnp.sin(x - y + t)

    def forcing_u(x, y, t):
        u_t = jnp.cos(x + t) * jnp.sin(y + t) + jnp.sin(x + t) * jnp.cos(y + t)
        return u_t + 2.0 * u_exact(x, y, t) / Re + jnp.cos(x - y + t)

    def forcing_v(x, y, t):
        v_t = -jnp.sin(x + t) * jnp.cos(y + t) - jnp.cos(x + t) * jnp.sin(y + t)
        return v_t + 2.0 * v_exact(x, y, t) / Re - jnp.cos(x - y + t)

    return Problem(
        name="periodic_forcing_2",
        u_bc=u_exact,
        v_bc=v_exact,
        u_init=lambda x, y: u_exact(x, y, 0.0),
        v_init=lambda x, y: v_exact(x, y, 0.0),
        forcing_u=forcing_u,
        forcing_v=forcing_v,
        u_exact=u_exact,
        v_exact=v_exact,
        p_exact=p_exact,
    )
