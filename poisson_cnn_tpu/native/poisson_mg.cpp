// Host-side geometric multigrid Poisson solver (C++), the native ground-truth
// role pyamg's C++ Ruge-Stuben solver plays in the reference
// (poisson_CNN/dataset/solvers/multigrid.py:98-150). Red-black Gauss-Seidel
// smoothing, full-weighting restriction, bilinear prolongation, V-cycles to a
// target residual. Double precision, 2-D, homogeneous Dirichlet; nonzero BCs
// are handled in Python by the same lifting trick the on-device path uses.
//
// Build: g++ -O3 -shared -fPIC -o libpoisson_mg.so poisson_mg.cpp
// ABI: solve_poisson_2d(rhs, u, n0, n1, dx0, dx1, tol, max_cycles) -> cycles

#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Grid {
  int n0, n1;
  double dx0, dx1;
};

inline int idx(int i, int j, int n1) { return i * n1 + j; }

// one red-black Gauss-Seidel sweep of lap(u) = f (interior only)
void rbgs_sweep(std::vector<double>& u, const std::vector<double>& f,
                const Grid& g) {
  const double ix2 = 1.0 / (g.dx0 * g.dx0);
  const double iy2 = 1.0 / (g.dx1 * g.dx1);
  const double diag = -2.0 * (ix2 + iy2);
  for (int color = 0; color < 2; ++color) {
    for (int i = 1; i < g.n0 - 1; ++i) {
      for (int j = 1 + ((i + color) & 1); j < g.n1 - 1; j += 2) {
        const double off = (u[idx(i - 1, j, g.n1)] + u[idx(i + 1, j, g.n1)]) * ix2 +
                           (u[idx(i, j - 1, g.n1)] + u[idx(i, j + 1, g.n1)]) * iy2;
        u[idx(i, j, g.n1)] = (f[idx(i, j, g.n1)] - off) / diag;
      }
    }
  }
}

void residual(const std::vector<double>& u, const std::vector<double>& f,
              const Grid& g, std::vector<double>& r) {
  const double ix2 = 1.0 / (g.dx0 * g.dx0);
  const double iy2 = 1.0 / (g.dx1 * g.dx1);
  std::fill(r.begin(), r.end(), 0.0);
  for (int i = 1; i < g.n0 - 1; ++i)
    for (int j = 1; j < g.n1 - 1; ++j) {
      const double lap =
          (u[idx(i - 1, j, g.n1)] - 2 * u[idx(i, j, g.n1)] + u[idx(i + 1, j, g.n1)]) * ix2 +
          (u[idx(i, j - 1, g.n1)] - 2 * u[idx(i, j, g.n1)] + u[idx(i, j + 1, g.n1)]) * iy2;
      r[idx(i, j, g.n1)] = f[idx(i, j, g.n1)] - lap;
    }
}

bool coarsenable(int n) { return (n - 1) % 2 == 0 && (n - 1) / 2 + 1 >= 5; }

void restrict_fw(const std::vector<double>& r, const Grid& g,
                 std::vector<double>& rc, const Grid& gc) {
  std::fill(rc.begin(), rc.end(), 0.0);
  for (int I = 1; I < gc.n0 - 1; ++I)
    for (int J = 1; J < gc.n1 - 1; ++J) {
      const int i = 2 * I, j = 2 * J;
      rc[idx(I, J, gc.n1)] =
          (4 * r[idx(i, j, g.n1)] +
           2 * (r[idx(i - 1, j, g.n1)] + r[idx(i + 1, j, g.n1)] +
                r[idx(i, j - 1, g.n1)] + r[idx(i, j + 1, g.n1)]) +
           r[idx(i - 1, j - 1, g.n1)] + r[idx(i - 1, j + 1, g.n1)] +
           r[idx(i + 1, j - 1, g.n1)] + r[idx(i + 1, j + 1, g.n1)]) /
          16.0;
    }
}

void prolong_add(const std::vector<double>& ec, const Grid& gc,
                 std::vector<double>& u, const Grid& g) {
  for (int I = 0; I < gc.n0; ++I)
    for (int J = 0; J < gc.n1; ++J) {
      const int i = 2 * I, j = 2 * J;
      const double e = ec[idx(I, J, gc.n1)];
      u[idx(i, j, g.n1)] += e;
      if (i + 1 < g.n0 && I + 1 < gc.n0)
        u[idx(i + 1, j, g.n1)] += 0.5 * (e + ec[idx(I + 1, J, gc.n1)]);
      if (j + 1 < g.n1 && J + 1 < gc.n1)
        u[idx(i, j + 1, g.n1)] += 0.5 * (e + ec[idx(I, J + 1, gc.n1)]);
      if (i + 1 < g.n0 && j + 1 < g.n1 && I + 1 < gc.n0 && J + 1 < gc.n1)
        u[idx(i + 1, j + 1, g.n1)] +=
            0.25 * (e + ec[idx(I + 1, J, gc.n1)] + ec[idx(I, J + 1, gc.n1)] +
                    ec[idx(I + 1, J + 1, gc.n1)]);
    }
}

void v_cycle(std::vector<double>& u, const std::vector<double>& f,
             const Grid& g, int pre, int post) {
  for (int s = 0; s < pre; ++s) rbgs_sweep(u, f, g);
  if (coarsenable(g.n0) && coarsenable(g.n1)) {
    std::vector<double> r(g.n0 * g.n1);
    residual(u, f, g, r);
    Grid gc{(g.n0 - 1) / 2 + 1, (g.n1 - 1) / 2 + 1, 2 * g.dx0, 2 * g.dx1};
    std::vector<double> rc(gc.n0 * gc.n1), ec(gc.n0 * gc.n1, 0.0);
    restrict_fw(r, g, rc, gc);
    v_cycle(ec, rc, gc, pre, post);
    prolong_add(ec, gc, u, g);
  } else {
    for (int s = 0; s < 60; ++s) rbgs_sweep(u, f, g);
  }
  for (int s = 0; s < post; ++s) rbgs_sweep(u, f, g);
}

double res_norm(const std::vector<double>& u, const std::vector<double>& f,
                const Grid& g) {
  std::vector<double> r(g.n0 * g.n1);
  residual(u, f, g, r);
  double s = 0.0;
  for (double v : r) s += v * v;
  return std::sqrt(s);
}

}  // namespace

extern "C" {

// Solve lap(u) = rhs, homogeneous Dirichlet. u must be zero-initialised (or a
// warm start with correct boundary values). Returns V-cycles used (-1: bad n).
int solve_poisson_2d(const double* rhs, double* u_out, int n0, int n1,
                     double dx0, double dx1, double tol, int max_cycles) {
  if (n0 < 5 || n1 < 5) return -1;
  Grid g{n0, n1, dx0, dx1};
  std::vector<double> f(rhs, rhs + n0 * n1);
  std::vector<double> u(u_out, u_out + n0 * n1);
  double f2 = 0.0;
  for (double v : f) f2 += v * v;
  const double target = tol * std::sqrt(f2) + 1e-300;
  int c = 0;
  for (; c < max_cycles; ++c) {
    v_cycle(u, f, g, 3, 3);
    if (res_norm(u, f, g) < target) {
      ++c;
      break;
    }
  }
  std::memcpy(u_out, u.data(), sizeof(double) * n0 * n1);
  return c;
}

}  // extern "C"
