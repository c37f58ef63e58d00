// Host dual simplex for LP — native C++ core.
//
// Role parity with the reference cpp/src/dual_simplex/ (solve.hpp
// solve_linear_program, phase1/phase2, bounded-variable ratio tests,
// basis refactorization): a bounded-variable dual simplex over the
// standard form
//
//     min c^T x   s.t.  A x - s = 0,   lv <= x <= uv,  lc <= s <= uc
//
// (ranged rows become bounded logicals). The initial slack basis is made
// dual-feasible by placing structurals at the bound matching the sign of
// their cost; free variables with nonzero cost get temporary big bounds
// (flagged in the status). Dense B^-1 with product-form eta updates and
// periodic refactorization — intended for small/medium host-side solves
// (B&B node cleanup, crossover polish, concurrent-LP races), not the
// large-scale path (that is the device PDLP).
//
// C ABI at the bottom (ds_solve) for ctypes.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace tpu_simplex {

constexpr double kInf = std::numeric_limits<double>::infinity();
constexpr double kBig = 1e9;       // temporary bound for free vars
constexpr double kPivTol = 1e-9;   // minimal pivot magnitude
constexpr double kFeasTol = 1e-9;  // primal bound tolerance
constexpr double kDualTol = 1e-9;  // reduced-cost tolerance

enum Status : int {
  kOptimal = 0,
  kInfeasible = 1,
  kUnbounded = 2,
  kIterLimit = 3,
  kTimeLimit = 4,
  kNumerical = 5,
  kHalted = 6,
};

struct Problem {
  int m = 0;  // rows
  int n = 0;  // structural columns
  // CSC of A (structurals only)
  std::vector<int> col_ptr, row_ind;
  std::vector<double> values;
  std::vector<double> c;        // n
  std::vector<double> lo, up;   // n + m (structurals then logicals)
};

class DualSimplex {
 public:
  explicit DualSimplex(const Problem& p) : p_(p), m_(p.m), nt_(p.n + p.m) {}

  int Solve(double time_limit, int iter_limit,
            const std::atomic<int>* halt, std::vector<double>* x_out,
            std::vector<double>* y_out, std::vector<double>* dj_out,
            int* iters_out) {
    const auto t0 = std::chrono::steady_clock::now();
    InitBasis();
    Refactorize();
    ComputeDuals();
    PricePrimal();

    int iter = 0;
    int status = kOptimal;
    while (true) {
      if (iter >= iter_limit) { status = kIterLimit; break; }
      if ((iter & 63) == 0) {
        if (halt && halt->load(std::memory_order_relaxed)) {
          status = kHalted; break;
        }
        const double el = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        if (el > time_limit) { status = kTimeLimit; break; }
      }
      // leaving variable: basic with largest bound violation
      int r = -1;
      double worst = kFeasTol;
      double dir = 0.0;  // +1: below lower (increase), -1: above upper
      for (int i = 0; i < m_; ++i) {
        const int j = basis_[i];
        const double v = xb_[i];
        if (v < p_.lo[j] - kFeasTol && p_.lo[j] - v > worst) {
          worst = p_.lo[j] - v; r = i; dir = +1.0;
        } else if (v > p_.up[j] + kFeasTol && v - p_.up[j] > worst) {
          worst = v - p_.up[j]; r = i; dir = -1.0;
        }
      }
      if (r < 0) break;  // primal feasible -> optimal (duals maintained)

      // pivot row: alpha = e_r^T B^-1 A_N
      std::vector<double> rho(m_, 0.0);
      BtranRow(r, &rho);
      // dual ratio test over nonbasic columns
      int q = -1;
      double best_ratio = kInf;
      double alpha_q = 0.0;
      for (int j = 0; j < nt_; ++j) {
        if (in_basis_[j]) continue;
        const double alpha = dir * ColDot(j, rho);
        // entering must move leaving var toward feasibility:
        //   at lower bound, increasing x_j helps if alpha < 0
        //   at upper bound, increasing... handled by sign of dj/alpha
        double ratio;
        if (at_lower_[j]) {
          if (alpha >= -kPivTol) continue;
          ratio = dj_[j] / (-alpha);
        } else if (at_upper_[j]) {
          if (alpha <= kPivTol) continue;
          ratio = -dj_[j] / alpha;
        } else {
          continue;  // free nonbasic handled via big bounds
        }
        if (ratio < best_ratio - 1e-12 ||
            (ratio < best_ratio + 1e-12 &&
             std::fabs(alpha) > std::fabs(alpha_q))) {
          best_ratio = ratio;
          q = j;
          alpha_q = dir * ColDot(j, rho);
        }
      }
      if (q < 0) {
        if (worst < 1e-6) {
          // numerically feasible: accept as optimal (degenerate residual)
          status = kOptimal;
          break;
        }
        // no entering column: the row certifies primal infeasibility
        status = kInfeasible;
        break;
      }
      if (!Pivot(r, q, dir)) { status = kNumerical; break; }
      ++iter;
      if ((iter % refactor_freq_) == 0) {
        Refactorize();
        ComputeDuals();
        PricePrimal();
      }
    }
    if (iters_out) *iters_out = iter;
    Extract(x_out, y_out, dj_out);
    if (status == kOptimal && used_big_bounds_ && BigBoundActive()) {
      status = kUnbounded;  // artificial bound is active at optimum
    }
    return status;
  }

 private:
  // column j of [A -I]
  double ColDot(int j, const std::vector<double>& rho) const {
    if (j < p_.n) {
      double s = 0.0;
      for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
        s += p_.values[k] * rho[p_.row_ind[k]];
      return s;
    }
    return -rho[j - p_.n];
  }

  void ScatterCol(int j, std::vector<double>* out) const {
    std::fill(out->begin(), out->end(), 0.0);
    if (j < p_.n) {
      for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
        (*out)[p_.row_ind[k]] = p_.values[k];
    } else {
      (*out)[j - p_.n] = -1.0;
    }
  }

  void InitBasis() {
    basis_.resize(m_);
    in_basis_.assign(nt_, 0);
    at_lower_.assign(nt_, 0);
    at_upper_.assign(nt_, 0);
    lo_ = p_.lo;
    up_ = p_.up;
    used_big_bounds_ = false;
    for (int j = 0; j < p_.n; ++j) {
      if (!std::isfinite(lo_[j]) && !std::isfinite(up_[j])) {
        lo_[j] = -kBig; up_[j] = kBig;
        used_big_bounds_ = true;
      } else if (!std::isfinite(lo_[j]) && p_.c[j] > kDualTol) {
        lo_[j] = -kBig; used_big_bounds_ = true;
      } else if (!std::isfinite(up_[j]) && p_.c[j] < -kDualTol) {
        up_[j] = kBig; used_big_bounds_ = true;
      }
      // dual-feasible placement: cost >= 0 -> lower, cost < 0 -> upper
      if (p_.c[j] >= 0) {
        if (std::isfinite(lo_[j])) at_lower_[j] = 1; else at_upper_[j] = 1;
      } else {
        if (std::isfinite(up_[j])) at_upper_[j] = 1; else at_lower_[j] = 1;
      }
    }
    for (int i = 0; i < m_; ++i) {
      const int j = p_.n + i;
      basis_[i] = j;
      in_basis_[j] = 1;
    }
  }

  void Refactorize() {
    // binv_ = inverse of B (dense Gauss-Jordan with partial pivoting)
    binv_.assign(m_ * m_, 0.0);
    std::vector<double> B(m_ * m_, 0.0);
    std::vector<double> col(m_);
    for (int i = 0; i < m_; ++i) {
      ScatterCol(basis_[i], &col);
      for (int r = 0; r < m_; ++r) B[r * m_ + i] = col[r];
      binv_[i * m_ + i] = 1.0;
    }
    for (int k = 0; k < m_; ++k) {
      int piv = k;
      for (int r = k + 1; r < m_; ++r)
        if (std::fabs(B[r * m_ + k]) > std::fabs(B[piv * m_ + k])) piv = r;
      if (std::fabs(B[piv * m_ + k]) < kPivTol) continue;  // singular-ish
      if (piv != k) {
        for (int c2 = 0; c2 < m_; ++c2) {
          std::swap(B[k * m_ + c2], B[piv * m_ + c2]);
          std::swap(binv_[k * m_ + c2], binv_[piv * m_ + c2]);
        }
      }
      const double d = 1.0 / B[k * m_ + k];
      for (int c2 = 0; c2 < m_; ++c2) {
        B[k * m_ + c2] *= d;
        binv_[k * m_ + c2] *= d;
      }
      for (int r = 0; r < m_; ++r) {
        if (r == k) continue;
        const double f = B[r * m_ + k];
        if (f == 0.0) continue;
        for (int c2 = 0; c2 < m_; ++c2) {
          B[r * m_ + c2] -= f * B[k * m_ + c2];
          binv_[r * m_ + c2] -= f * binv_[k * m_ + c2];
        }
      }
    }
    ComputeXb();
  }

  void ComputeXb() {
    // x_B = B^-1 (0 - N x_N)   (rhs of [A -I] z = 0 is 0)
    std::vector<double> rhs(m_, 0.0);
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      const double v = at_upper_[j] ? up_[j] : lo_[j];
      if (v == 0.0) continue;
      if (j < p_.n) {
        for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
          rhs[p_.row_ind[k]] -= p_.values[k] * v;
      } else {
        rhs[j - p_.n] += v;
      }
    }
    xb_.assign(m_, 0.0);
    for (int i = 0; i < m_; ++i) {
      double s = 0.0;
      for (int k = 0; k < m_; ++k) s += binv_[i * m_ + k] * rhs[k];
      xb_[i] = s;
    }
  }

  void ComputeDuals() {
    // y^T = c_B^T B^-1
    y_.assign(m_, 0.0);
    for (int i = 0; i < m_; ++i) {
      const int j = basis_[i];
      const double cb = (j < p_.n) ? p_.c[j] : 0.0;
      if (cb == 0.0) continue;
      for (int k = 0; k < m_; ++k) y_[k] += cb * binv_[i * m_ + k];
    }
  }

  void PricePrimal() {
    dj_.assign(nt_, 0.0);
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      double cj = (j < p_.n) ? p_.c[j] : 0.0;
      double s = 0.0;
      if (j < p_.n) {
        for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
          s += p_.values[k] * y_[p_.row_ind[k]];
      } else {
        s = -y_[j - p_.n];
      }
      dj_[j] = cj - s;
    }
  }

  void BtranRow(int r, std::vector<double>* rho) const {
    for (int k = 0; k < m_; ++k) (*rho)[k] = binv_[r * m_ + k];
  }

  bool Pivot(int r, int q, double dir) {
    // alpha column: B^-1 a_q
    std::vector<double> aq(m_), alpha(m_);
    ScatterCol(q, &aq);
    for (int i = 0; i < m_; ++i) {
      double s = 0.0;
      for (int k = 0; k < m_; ++k) s += binv_[i * m_ + k] * aq[k];
      alpha[i] = s;
    }
    if (std::fabs(alpha[r]) < kPivTol) return false;
    const int leave = basis_[r];
    // leaving variable goes to the violated bound
    in_basis_[leave] = 0;
    if (dir > 0) { at_lower_[leave] = 1; at_upper_[leave] = 0; }
    else { at_upper_[leave] = 1; at_lower_[leave] = 0; }
    in_basis_[q] = 1;
    at_lower_[q] = at_upper_[q] = 0;
    basis_[r] = q;
    // product-form update of binv_: row r scaled, others eliminated
    const double pr = 1.0 / alpha[r];
    for (int k = 0; k < m_; ++k) binv_[r * m_ + k] *= pr;
    for (int i = 0; i < m_; ++i) {
      if (i == r) continue;
      const double f = alpha[i];
      if (f == 0.0) continue;
      for (int k = 0; k < m_; ++k)
        binv_[i * m_ + k] -= f * binv_[r * m_ + k];
    }
    ComputeXb();
    // dual update: recompute (dense m^2; fine at these sizes)
    ComputeDuals();
    PricePrimal();
    return true;
  }

  bool BigBoundActive() const {
    for (int i = 0; i < m_; ++i) {
      const int j = basis_[i];
      if (std::fabs(std::fabs(xb_[i]) - kBig) < 1e-3) return true;
    }
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      const double v = at_upper_[j] ? up_[j] : lo_[j];
      if (std::fabs(std::fabs(v) - kBig) < 1e-3) return true;
    }
    return false;
  }

  void Extract(std::vector<double>* x_out, std::vector<double>* y_out,
               std::vector<double>* dj_out) {
    std::vector<double> z(nt_, 0.0);
    for (int j = 0; j < nt_; ++j)
      if (!in_basis_[j]) z[j] = at_upper_[j] ? up_[j] : lo_[j];
    for (int i = 0; i < m_; ++i) z[basis_[i]] = xb_[i];
    x_out->assign(z.begin(), z.begin() + p_.n);
    *y_out = y_;
    dj_out->assign(p_.n, 0.0);
    for (int j = 0; j < p_.n; ++j) (*dj_out)[j] = dj_[j];
  }

  const Problem& p_;
  int m_, nt_;
  std::vector<int> basis_;
  std::vector<uint8_t> in_basis_, at_lower_, at_upper_;
  std::vector<double> lo_, up_;
  std::vector<double> binv_, xb_, y_, dj_;
  bool used_big_bounds_ = false;
  int refactor_freq_ = 100;  // reference simplex_solver_settings.hpp
};

}  // namespace tpu_simplex

extern "C" {

// C ABI for ctypes. Returns tpu_simplex::Status. `halt` may be nullptr or
// point to an int set nonzero to request cooperative cancellation
// (reference concurrent-LP atomic halt, solve.cu:222).
int ds_solve(int m, int n,
             const int64_t* col_ptr, const int64_t* row_ind,
             const double* values,
             const double* c,
             const double* var_lo, const double* var_up,
             const double* row_lo, const double* row_up,
             double time_limit, int iter_limit,
             const int* halt,
             double* x_out, double* y_out, double* dj_out,
             double* obj_out, int* iters_out) {
  tpu_simplex::Problem p;
  p.m = m;
  p.n = n;
  p.col_ptr.assign(col_ptr, col_ptr + n + 1);
  const int64_t nnz = col_ptr[n];
  p.row_ind.assign(row_ind, row_ind + nnz);
  p.values.assign(values, values + nnz);
  p.c.assign(c, c + n);
  p.lo.resize(n + m);
  p.up.resize(n + m);
  for (int j = 0; j < n; ++j) { p.lo[j] = var_lo[j]; p.up[j] = var_up[j]; }
  for (int i = 0; i < m; ++i) {
    p.lo[n + i] = row_lo[i];
    p.up[n + i] = row_up[i];
  }
  tpu_simplex::DualSimplex solver(p);
  std::vector<double> x, y, dj;
  int iters = 0;
  std::atomic<int> halt_flag{0};
  const std::atomic<int>* halt_ptr = nullptr;
  // reinterpret user int* as atomic flag via polling copy
  // (the caller updates the int; we wrap reads)
  struct HaltView : std::atomic<int> {};
  int status;
  if (halt != nullptr) {
    // NOTE: relies on int loads being atomic on this platform (x86-64)
    status = solver.Solve(
        time_limit, iter_limit,
        reinterpret_cast<const std::atomic<int>*>(halt), &x, &y, &dj,
        &iters);
  } else {
    status = solver.Solve(time_limit, iter_limit, &halt_flag, &x, &y, &dj,
                          &iters);
  }
  std::memcpy(x_out, x.data(), sizeof(double) * n);
  std::memcpy(y_out, y.data(), sizeof(double) * m);
  std::memcpy(dj_out, dj.data(), sizeof(double) * n);
  double obj = 0.0;
  for (int j = 0; j < n; ++j) obj += c[j] * x[j];
  *obj_out = obj;
  *iters_out = iters;
  return status;
}

}  // extern "C"
