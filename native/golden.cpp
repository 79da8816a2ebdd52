// Golden-model CPU multigrid backend (C++), the native verification tier.
//
// Role: the reference's CPU apps (NOCUDA_TESI/*) served as the golden
// backend for its CUDA kernels (SURVEY.md §4.6).  This library plays the
// same role for the TPU framework: an independent, from-scratch C++
// implementation of the *corrected* numerics (SURVEY.md §2.7: fixed 3D/1D
// residual signs, no dropped RHS terms, no red-black race) that the JAX
// tiers are cross-checked against in tests/test_native.py.
//
// Not a port: one dimension-generic core (strided loops over up to 3
// axes), two persistent arrays per level, float32 arithmetic to match the
// reference precision envelope.
//
// C ABI: mg_solve(...) below; driven from Python via ctypes
// (pde_multigrid_tpu/utils/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int PROB_ODE1D = 0;
constexpr int PROB_LYAPUNOV2D = 1;
constexpr int PROB_POISSON = 2;
constexpr int PROB_HJB = 3;  // Kruzkov min-time HJB (thesis §3.3), upwind

struct Level {
  int nd;
  int shape[3];
  double h[3];
  double orig[3];
  std::vector<float> v, f;

  long size() const {
    long s = 1;
    for (int d = 0; d < nd; ++d) s *= shape[d];
    return s;
  }
  long stride(int ax) const {
    long s = 1;
    for (int d = ax + 1; d < nd; ++d) s *= shape[d];
    return s;
  }
};

struct Params {
  int problem;
  double alpha;      // lyapunov
  double a[4];       // lyapunov system matrix (row major)
  double pin_cells;  // hjb: exact-pin ball radius in units of max(h)
};

// classical closed-form minimum time for x1' = x2, x2' = u, |u| <= 1
inline double hjb_min_time(double x1, double x2) {
  double half = 0.5 * x2 * std::fabs(x2);
  if (x1 > -half)
    return x2 + 2.0 * std::sqrt(std::max(0.5 * x2 * x2 + x1, 0.0));
  return -x2 + 2.0 * std::sqrt(std::max(0.5 * x2 * x2 - x1, 0.0));
}

inline bool on_boundary(const Level& L, const int* idx) {
  for (int d = 0; d < L.nd; ++d)
    if (idx[d] == 0 || idx[d] == L.shape[d] - 1) return true;
  return false;
}

// hjb target pinning: points inside the exact-value ball are Dirichlet
inline bool is_pinned(const Level& L, const Params& P, const int* idx) {
  if (P.problem != PROB_HJB) return false;
  double r0 = P.pin_cells * std::max(L.h[0], L.h[1]);
  double x = L.orig[0] + idx[0] * L.h[0];
  double y = L.orig[1] + idx[1] * L.h[1];
  return x * x + y * y <= std::max(r0, 1e-12) * std::max(r0, 1e-12);
}

template <typename F>
void for_each(const Level& L, F&& fn) {
  int idx[3] = {0, 0, 0};
  long n = L.size();
  for (long flat = 0; flat < n; ++flat) {
    long r = flat;
    for (int d = 0; d < L.nd; ++d) {
      idx[d] = (int)(r / L.stride(d));
      r %= L.stride(d);
    }
    fn(idx, flat);
  }
}

inline double coord(const Level& L, int d, int i) {
  return L.orig[d] + i * L.h[d];
}

// local solve for the center point (the relax update); also used to form
// the residual via apply().
struct Ops {
  const Params& P;

  double apply(const Level& L, const float* v, const int* idx,
               long flat) const {
    if (P.problem == PROB_POISSON) {
      double acc = 0.0;
      for (int d = 0; d < L.nd; ++d) {
        long s = L.stride(d);
        double ih2 = 1.0 / (L.h[d] * L.h[d]);
        acc += (v[flat - s] - 2.0 * v[flat] + v[flat + s]) * ih2;
      }
      return acc;
    }
    if (P.problem == PROB_ODE1D) {
      double x = coord(L, 0, idx[0]);
      double epx = std::exp(x) + 1.0;
      return (v[flat + 1] - v[flat]) / L.h[0] - v[flat] / epx;
    }
    if (P.problem == PROB_HJB) {
      // W + c1 (W - nb1) + max(W - m2, 0)/h2  (monotone Godunov upwind)
      double y = coord(L, 1, idx[1]);
      long sx = L.stride(0), sy = L.stride(1);
      double c1 = std::fabs(y) / L.h[0];
      double nb1 = y > 0 ? v[flat + sx] : v[flat - sx];
      double m2 = std::min(v[flat + sy], v[flat - sy]);
      double c2 = 1.0 / L.h[1];
      return v[flat] + c1 * (v[flat] - nb1) +
             c2 * std::max((double)v[flat] - m2, 0.0);
    }
    // Lyapunov 2D: K1 u_x + K2 u_y + alpha u (forward differences)
    double x = coord(L, 0, idx[0]);
    double y = coord(L, 1, idx[1]);
    double k1 = P.a[0] * x + P.a[1] * y;
    double k2 = P.a[2] * x + P.a[3] * y;
    long sx = L.stride(0), sy = L.stride(1);
    return k1 * (v[flat + sx] - v[flat]) / L.h[0] +
           k2 * (v[flat + sy] - v[flat]) / L.h[1] + P.alpha * v[flat];
  }

  double local_solve(const Level& L, const float* v, const float* f,
                     const int* idx, long flat) const {
    if (P.problem == PROB_POISSON) {
      double num = -f[flat], den = 0.0;
      for (int d = 0; d < L.nd; ++d) {
        long s = L.stride(d);
        double ih2 = 1.0 / (L.h[d] * L.h[d]);
        num += (v[flat - s] + v[flat + s]) * ih2;
        den += 2.0 * ih2;
      }
      return num / den;
    }
    if (P.problem == PROB_ODE1D) {
      double x = coord(L, 0, idx[0]);
      double epx = std::exp(x) + 1.0;
      return (v[flat + 1] * epx - f[flat] * L.h[0] * epx) /
             (epx + L.h[0]);
    }
    if (P.problem == PROB_HJB) {
      double y = coord(L, 1, idx[1]);
      long sx = L.stride(0), sy = L.stride(1);
      double c1 = std::fabs(y) / L.h[0];
      double nb1 = y > 0 ? v[flat + sx] : v[flat - sx];
      double m2 = std::min(v[flat + sy], v[flat - sy]);
      double c2 = 1.0 / L.h[1];
      double w_in = (f[flat] + c1 * nb1) / (1.0 + c1);
      double w_act = (f[flat] + c1 * nb1 + c2 * m2) / (1.0 + c1 + c2);
      return w_in <= m2 ? w_in : w_act;
    }
    double x = coord(L, 0, idx[0]);
    double y = coord(L, 1, idx[1]);
    double k1 = P.a[0] * x + P.a[1] * y;
    double k2 = P.a[2] * x + P.a[3] * y;
    long sx = L.stride(0), sy = L.stride(1);
    double den = k1 * L.h[1] + k2 * L.h[0] - P.alpha * L.h[0] * L.h[1];
    return (L.h[1] * k1 * v[flat + sx] + L.h[0] * k2 * v[flat + sy] -
            f[flat] * L.h[0] * L.h[1]) /
           den;
  }
};

// red-black Gauss-Seidel: even-parity pass then odd-parity pass
void relax(const Ops& ops, Level& L, int sweeps) {
  for (int s = 0; s < sweeps; ++s) {
    for (int color = 0; color < 2; ++color) {
      for_each(L, [&](const int* idx, long flat) {
        int par = 0;
        for (int d = 0; d < L.nd; ++d) par += idx[d];
        if ((par & 1) != color) return;
        if (on_boundary(L, idx) || is_pinned(L, ops.P, idx)) return;
        L.v[flat] =
            (float)ops.local_solve(L, L.v.data(), L.f.data(), idx, flat);
      });
    }
  }
}

void residual(const Ops& ops, const Level& L, std::vector<float>& r) {
  r.assign(L.size(), 0.0f);
  for_each(L, [&](const int* idx, long flat) {
    if (on_boundary(L, idx) || is_pinned(L, ops.P, idx)) return;
    r[flat] =
        (float)(L.f[flat] - ops.apply(L, L.v.data(), idx, flat));
  });
}

// separable full weighting [1/4,1/2,1/4]^d, boundary injection
void restrict_fw(const Level& F, const std::vector<float>& fine,
                 Level& C, std::vector<float>& coarse) {
  coarse.assign(C.size(), 0.0f);
  for_each(C, [&](const int* cidx, long cflat) {
    int fidx[3];
    for (int d = 0; d < C.nd; ++d) fidx[d] = 2 * cidx[d];
    long fflat = 0;
    for (int d = 0; d < C.nd; ++d) fflat += fidx[d] * F.stride(d);
    if (on_boundary(C, cidx)) {
      coarse[cflat] = fine[fflat];
      return;
    }
    double acc = 0.0;
    int off[3] = {0, 0, 0};
    // enumerate the 3^d neighborhood
    int total = 1;
    for (int d = 0; d < C.nd; ++d) total *= 3;
    for (int k = 0; k < total; ++k) {
      int r = k;
      double w = 1.0;
      long nb = fflat;
      for (int d = 0; d < C.nd; ++d) {
        off[d] = (r % 3) - 1;
        r /= 3;
        w *= (off[d] == 0) ? 0.5 : 0.25;
        nb += off[d] * F.stride(d);
      }
      acc += w * fine[nb];
    }
    coarse[cflat] = (float)acc;
  });
}

// (multi)linear prolongation, interior-only write into `fine`
void prolong_add(const Params& P, const Level& C,
                 const std::vector<float>& coarse, Level& F,
                 std::vector<float>& fine, bool add) {
  for_each(F, [&](const int* fidx, long fflat) {
    if (on_boundary(F, fidx) || is_pinned(F, P, fidx)) return;
    double acc = 0.0;
    // product of per-axis linear weights
    int base[3], odd[3];
    for (int d = 0; d < F.nd; ++d) {
      base[d] = fidx[d] / 2;
      odd[d] = fidx[d] & 1;
    }
    int total = 1;
    for (int d = 0; d < F.nd; ++d) total *= (odd[d] ? 2 : 1);
    for (int k = 0; k < total; ++k) {
      int r = k;
      double w = 1.0;
      long nb = 0;
      for (int d = 0; d < F.nd; ++d) {
        int pick = 0;
        if (odd[d]) {
          pick = r & 1;
          r >>= 1;
          w *= 0.5;
        }
        nb += (long)(base[d] + pick) * C.stride(d);
      }
      acc += w * coarse[nb];
    }
    if (add)
      fine[fflat] += (float)acc;
    else
      fine[fflat] = (float)acc;
  });
}

// straight injection fine -> coarse (FAS solution restriction)
void inject_sol(const Level& F, const std::vector<float>& fine,
                const Level& C, std::vector<float>& out) {
  out.assign(C.size(), 0.0f);
  for_each(C, [&](const int* cidx, long cflat) {
    long fflat = 0;
    for (int d = 0; d < C.nd; ++d)
      fflat += (long)(2 * cidx[d]) * F.stride(d);
    out[cflat] = fine[fflat];
  });
}

struct Hierarchy {
  std::vector<Level> levels;
  Params P;

  // Full Approximation Scheme V-cycle (nonlinear multigrid; reduces to
  // the correction scheme for linear operators) — used for PROB_HJB
  void fas_v_cycle(int l, int nu1, int nu2) {
    Ops ops{P};
    Level& L = levels[l];
    relax(ops, L, nu1);
    if (l != (int)levels.size() - 1) {
      Level& C = levels[l + 1];
      std::vector<float> r, rc, v0c;
      residual(ops, L, r);
      restrict_fw(L, r, C, rc);
      inject_sol(L, L.v, C, v0c);
      C.v = v0c;
      // f_c = N_c(v0c) + R r on the interior
      for_each(C, [&](const int* idx, long flat) {
        if (on_boundary(C, idx) || is_pinned(C, P, idx)) {
          C.f[flat] = 0.0f;
          return;
        }
        C.f[flat] =
            (float)(rc[flat] + ops.apply(C, C.v.data(), idx, flat));
      });
      fas_v_cycle(l + 1, nu1, nu2);
      std::vector<float> err(C.size());
      for (long i = 0; i < C.size(); ++i) err[i] = C.v[i] - v0c[i];
      prolong_add(P, C, err, L, L.v, /*add=*/true);
    }
    relax(ops, L, nu2);
  }

  void v_cycle(int l, int nu1, int nu2) {
    if (P.problem == PROB_HJB) {
      fas_v_cycle(l, nu1, nu2);
      return;
    }
    Ops ops{P};
    Level& L = levels[l];
    relax(ops, L, nu1);
    if (l != (int)levels.size() - 1) {
      Level& C = levels[l + 1];
      std::vector<float> r;
      residual(ops, L, r);
      restrict_fw(L, r, C, C.f);
      std::fill(C.v.begin(), C.v.end(), 0.0f);
      v_cycle(l + 1, nu1, nu2);
      prolong_add(P, C, C.v, L, L.v, /*add=*/true);
    }
    relax(ops, L, nu2);
  }

  void fmg(int nu0, int nu1, int nu2) {
    int nlev = (int)levels.size();
    for (int l = 0; l + 1 < nlev; ++l)
      restrict_fw(levels[l], levels[l].f, levels[l + 1],
                  levels[l + 1].f);
    Level& bot = levels.back();
    for_each(bot, [&](const int* idx, long flat) {
      if (!on_boundary(bot, idx)) bot.v[flat] = 0.0f;
    });
    for (int l = nlev - 1; l >= 0; --l) {
      for (int k = 0; k < nu0; ++k) v_cycle(l, nu1, nu2);
      if (l > 0) prolong_add(P, levels[l], levels[l].v, levels[l - 1],
                             levels[l - 1].v, /*add=*/false);
    }
  }

  double residual_l2() {
    Ops ops{P};
    std::vector<float> r;
    residual(ops, levels[0], r);
    double acc = 0.0;
    for (float x : r) acc += (double)x * x;
    return std::sqrt(acc / (double)levels[0].size());
  }
};

void init_level(Level& L, const Params& P) {
  // Dirichlet boundary from the analytic solution; f = analytic RHS;
  // interior v zeroed (fix of reference defect §2.7.7)
  for_each(L, [&](const int* idx, long flat) {
    double x = coord(L, 0, idx[0]);
    double y = L.nd > 1 ? coord(L, 1, idx[1]) : 0.0;
    double z = L.nd > 2 ? coord(L, 2, idx[2]) : 0.0;
    double exact = 0.0, rhs = 0.0;
    if (P.problem == PROB_ODE1D) {
      exact = (std::exp(x) + x - 3.0) / (1.0 + std::exp(-x));
      rhs = std::exp(x);
    } else if (P.problem == PROB_LYAPUNOV2D) {
      exact = 2 * x * x - 4 * x * y + 2 * y * y;
      rhs = 0.0;
    } else if (P.problem == PROB_HJB) {
      exact = 1.0 - std::exp(-hjb_min_time(x, y));
      rhs = 1.0;
    } else {
      const double pi = 3.14159265358979323846;
      double u = std::sin(pi * x);
      double lam = pi * pi;
      if (L.nd > 1) { u *= std::sin(pi * y); lam += pi * pi; }
      if (L.nd > 2) { u *= std::sin(pi * z); lam += pi * pi; }
      exact = u;
      rhs = -lam * u;
    }
    L.f[flat] = (float)rhs;
    L.v[flat] =
        (on_boundary(L, idx) || is_pinned(L, P, idx)) ? (float)exact
                                                      : 0.0f;
  });
}

}  // namespace

extern "C" {

// Solve and write the finest-level v into out_v (size prod(shape)).
// kind: 0 = FMG, 1 = V-cycles (max_cycles of them).
// Returns the final finest-level mean-L2 residual.
double mg_solve(int problem, int nd, const int* shape,
                const double* domain_lo, const double* domain_hi,
                int kind, int nu0, int nu1, int nu2, int max_cycles,
                const double* lyap_a, double lyap_alpha,
                double hjb_pin_cells, float* out_v) {
  Params P;
  P.problem = problem;
  P.alpha = lyap_alpha;
  P.pin_cells = hjb_pin_cells;
  for (int i = 0; i < 4; ++i) P.a[i] = lyap_a ? lyap_a[i] : 0.0;

  // numGrids = log2(N-1) (reference MultiGrid1D.cpp:21-22)
  int levels = 0;
  {
    int n = shape[0] - 1;
    while (n > 1) { n >>= 1; ++levels; }
  }

  Hierarchy H;
  H.P = P;
  H.levels.resize(levels);
  int cur[3];
  for (int d = 0; d < nd; ++d) cur[d] = shape[d];
  for (int l = 0; l < levels; ++l) {
    Level& L = H.levels[l];
    L.nd = nd;
    for (int d = 0; d < nd; ++d) {
      L.shape[d] = cur[d];
      L.orig[d] = domain_lo[d];
      L.h[d] = (domain_hi[d] - domain_lo[d]) / (cur[d] - 1);
    }
    L.v.assign(L.size(), 0.0f);
    L.f.assign(L.size(), 0.0f);
    init_level(L, P);
    for (int d = 0; d < nd; ++d) cur[d] = (cur[d] - 1) / 2 + 1;
  }

  if (kind == 0) {
    H.fmg(nu0, nu1, nu2);
    for (int k = 1; k < max_cycles; ++k) H.v_cycle(0, nu1, nu2);
  } else {
    for (int k = 0; k < max_cycles; ++k) H.v_cycle(0, nu1, nu2);
  }

  std::memcpy(out_v, H.levels[0].v.data(),
              H.levels[0].size() * sizeof(float));
  return H.residual_l2();
}

}  // extern "C"
