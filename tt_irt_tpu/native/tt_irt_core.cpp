// Native host IRT kernel: linear-spline inverse Rosenblatt through a TT.
//
// Role-parallel to the reference's C layer (utils/tt_irt1_int64.c and
// python/tt_irt_py/tt_irt1_int32.c): a self-contained CPU executor for
// the sampling hot path, used as the host-side fallback/verification
// engine and for embedding outside a JAX runtime.  The algorithm matches
// samplers/irt.py (density variant 'lin' and sqrt variant 'sqr'):
// backward semi-marginalization, then per-sample conditional CDF
// construction, bisection and quadratic inversion.  OpenMP parallelizes
// over sample blocks; inner contractions are written as simple loops the
// compiler vectorizes (ranks are small).
//
// Build: see Makefile (g++ -O3 -fopenmp -shared -fPIC).
//
// Layout conventions (all row-major / C-contiguous):
//   cores: concatenated, core k has shape (r[k], n[k], r[k+1])
//   grids: concatenated, grid k has n[k] entries
//   q, x_out: (M, d);  logf_out: (M,)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct TTView {
  int d;
  const int64_t* n;
  const int64_t* r;  // length d+1
  std::vector<const double*> core;  // per-dim pointers
  std::vector<const double*> grid;
};

inline double core_at(const TTView& tt, int k, int64_t a, int64_t i,
                      int64_t b) {
  // (r1, n, r2) row-major
  return tt.core[k][(a * tt.n[k] + i) * tt.r[k + 1] + b];
}

// Backward pass (lin): P_k = core_k x_right p_{k+1}, p via trapezoid.
void prepare_lin(const TTView& tt, std::vector<std::vector<double>>& P) {
  int d = tt.d;
  P.resize(d);
  std::vector<double> pnext(tt.r[d], 1.0);
  for (int k = d - 1; k >= 0; --k) {
    int64_t r1 = tt.r[k], n = tt.n[k], r2 = tt.r[k + 1];
    P[k].assign(r1 * n, 0.0);
    for (int64_t a = 0; a < r1; ++a)
      for (int64_t i = 0; i < n; ++i) {
        double s = 0.0;
        const double* row = &tt.core[k][(a * n + i) * r2];
        for (int64_t b = 0; b < r2; ++b) s += row[b] * pnext[b];
        P[k][a * n + i] = s;
      }
    if (k > 0) {
      std::vector<double> pk(r1, 0.0);
      const double* x = tt.grid[k];
      for (int64_t a = 0; a < r1; ++a) {
        double s = 0.0;
        for (int64_t i = 0; i + 1 < n; ++i)
          s += 0.5 * (P[k][a * n + i] + P[k][a * n + i + 1]) *
               (x[i + 1] - x[i]);
        pk[a] = s;
      }
      // scale-invariant renormalization (matches irt.py)
      double mx = 1e-300;
      for (double v : pk) mx = std::max(mx, std::fabs(v));
      for (auto& v : pk) v /= mx;
      pnext = pk;
    }
  }
}

// Backward pass (sqr): Gram carry G, P_k = core G core^T per node.
void prepare_sqr(const TTView& tt, std::vector<std::vector<double>>& P) {
  int d = tt.d;
  P.resize(d);
  std::vector<double> gram(tt.r[d] * tt.r[d], 0.0);
  for (int64_t a = 0; a < tt.r[d]; ++a) gram[a * tt.r[d] + a] = 1.0;
  for (int k = d - 1; k >= 0; --k) {
    int64_t r1 = tt.r[k], n = tt.n[k], r2 = tt.r[k + 1];
    P[k].assign(r1 * r1 * n, 0.0);
    std::vector<double> tmp(r2);
    for (int64_t i = 0; i < n; ++i) {
      for (int64_t a = 0; a < r1; ++a) {
        // tmp = G * core[a, i, :]
        for (int64_t c = 0; c < r2; ++c) {
          double s = 0.0;
          for (int64_t e = 0; e < r2; ++e)
            s += gram[c * r2 + e] * core_at(tt, k, a, i, e);
          tmp[c] = s;
        }
        for (int64_t b = 0; b <= a; ++b) {
          double s = 0.0;
          for (int64_t c = 0; c < r2; ++c)
            s += tmp[c] * core_at(tt, k, b, i, c);
          P[k][(a * r1 + b) * n + i] = s;
          P[k][(b * r1 + a) * n + i] = s;
        }
      }
    }
    if (k > 0) {
      const double* x = tt.grid[k];
      std::vector<double> g2(r1 * r1, 0.0);
      for (int64_t i = 0; i < n; ++i) {
        double w = 0.0;
        if (i > 0) w += 0.5 * (x[i] - x[i - 1]);
        if (i + 1 < n) w += 0.5 * (x[i + 1] - x[i]);
        for (int64_t a = 0; a < r1; ++a)
          for (int64_t b = 0; b < r1; ++b)
            g2[a * r1 + b] += w * P[k][(a * r1 + b) * n + i];
      }
      double mx = 1e-300;
      for (double v : g2) mx = std::max(mx, std::fabs(v));
      for (auto& v : g2) v /= mx;
      gram.assign(g2.begin(), g2.end());
      gram.resize(r1 * r1);
    }
  }
}

inline void invert_cdf_on_row(const double* fk, const double* x, int64_t n,
                              double qk, double* xk_out, double* fk_out) {
  // build normalized CDF on the fly (trapezoid), locate + invert
  // first pass: total mass
  double total = 0.0;
  for (int64_t i = 0; i + 1 < n; ++i)
    total += 0.5 * (fk[i] + fk[i + 1]) * (x[i + 1] - x[i]);
  bool degenerate = !(total > 0.0);
  double c_lo = 0.0;
  int64_t i0 = 0;
  if (degenerate) {
    // uniform fallback
    double span = x[n - 1] - x[0];
    double target = qk * span;
    double acc = 0.0;
    for (int64_t i = 0; i + 1 < n; ++i) {
      double seg = x[i + 1] - x[i];
      if (acc + seg >= target || i == n - 2) {
        *xk_out = x[i] + (target - acc);
        *fk_out = 1.0 / span;
        return;
      }
      acc += seg;
    }
  }
  double target = qk * total;
  double acc = 0.0;
  for (int64_t i = 0; i + 1 < n; ++i) {
    double seg = 0.5 * (fk[i] + fk[i + 1]) * (x[i + 1] - x[i]);
    if (acc + seg > target || i == n - 2) {
      i0 = i;
      c_lo = acc;
      break;
    }
    acc += seg;
  }
  double x1 = x[i0], x2 = x[i0 + 1];
  double h = x2 - x1;
  double f1 = fk[i0] / total, f2 = fk[i0 + 1] / total;
  double c1 = c_lo / total;
  double a = 0.5 * (f2 - f1) / h;
  // citardauq root form: 2t / (f1 + sqrt(f1^2 + 4at)) — stable for
  // near-flat densities (a -> 0), where the textbook (-f1 + sqrt(D)) /
  // (2a) form cancels catastrophically; no a == 0 special case needed
  double t = qk - c1;
  double disc = f1 * f1 + 4.0 * a * t;
  double den = f1 + std::sqrt(disc > 0.0 ? disc : 0.0);
  double xk = (den <= 0.0) ? x1 : x1 + 2.0 * t / den;
  if (xk < x1) xk = x1;
  if (xk > x2) xk = x2;
  *xk_out = xk;
  double la = (x2 - xk) / h, lb = (xk - x1) / h;
  *fk_out = f1 * la + f2 * lb;
}

}  // namespace

extern "C" {

// mode: 0 = lin (density), 1 = sqr (sqrt density)
int tt_irt_native(int mode, int d, const int64_t* n, const int64_t* r,
                  const double* cores, const double* grids, int64_t m,
                  const double* q, double* x_out, double* logf_out) {
  TTView tt;
  tt.d = d;
  tt.n = n;
  tt.r = r;
  tt.core.resize(d);
  tt.grid.resize(d);
  {
    const double* pc = cores;
    const double* pg = grids;
    for (int k = 0; k < d; ++k) {
      tt.core[k] = pc;
      pc += r[k] * n[k] * r[k + 1];
      tt.grid[k] = pg;
      pg += n[k];
    }
  }
  std::vector<std::vector<double>> P;
  if (mode == 0)
    prepare_lin(tt, P);
  else
    prepare_sqr(tt, P);

  int64_t rmax = 0, nmax = 0;
  for (int k = 0; k <= d; ++k) rmax = std::max(rmax, r[k]);
  for (int k = 0; k < d; ++k) nmax = std::max(nmax, n[k]);

#pragma omp parallel
  {
    std::vector<double> phi(rmax), phin(rmax), fk(nmax), gsq(rmax * rmax);
#pragma omp for schedule(static)
    for (int64_t s = 0; s < m; ++s) {
      int64_t rcur = 1;
      phi[0] = 1.0;
      double lf = 0.0;
      for (int k = 0; k < d; ++k) {
        int64_t r1 = r[k], nk = n[k], r2 = r[k + 1];
        const double* x = tt.grid[k];
        if (mode == 0) {
          for (int64_t i = 0; i < nk; ++i) {
            double v = 0.0;
            for (int64_t a = 0; a < r1; ++a)
              v += phi[a] * P[k][a * nk + i];
            fk[i] = std::fabs(v);
          }
        } else {
          for (int64_t a = 0; a < r1; ++a)
            for (int64_t b = 0; b < r1; ++b)
              gsq[a * r1 + b] = phi[a] * phi[b];
          for (int64_t i = 0; i < nk; ++i) {
            double v = 0.0;
            for (int64_t a = 0; a < r1; ++a)
              for (int64_t b = 0; b < r1; ++b)
                v += gsq[a * r1 + b] * P[k][(a * r1 + b) * nk + i];
            fk[i] = v > 0.0 ? v : 0.0;
          }
        }
        double xk, fcond;
        invert_cdf_on_row(fk.data(), x, nk, q[s * d + k], &xk, &fcond);
        x_out[s * d + k] = xk;
        lf += std::log(std::max(fcond, 1e-300));
        if (k < d - 1) {
          // locate interval for interpolation weights
          int64_t i0 = 0;
          while (i0 + 2 < nk && x[i0 + 1] < xk) ++i0;
          double la = (x[i0 + 1] - xk) / (x[i0 + 1] - x[i0]);
          double lb = 1.0 - la;
          double mx = 1e-300;
          for (int64_t b = 0; b < r2; ++b) {
            double v = 0.0;
            for (int64_t a = 0; a < r1; ++a)
              v += phi[a] * (la * core_at(tt, k, a, i0, b) +
                             lb * core_at(tt, k, a, i0 + 1, b));
            phin[b] = v;
            mx = std::max(mx, std::fabs(v));
          }
          for (int64_t b = 0; b < r2; ++b) phi[b] = phin[b] / mx;
          rcur = r2;
          (void)rcur;
        }
      }
      logf_out[s] = lf;
    }
  }
  return 0;
}

int tt_irt_native_version() { return 1; }

}  // extern "C"
