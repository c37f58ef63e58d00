// Host dual simplex for LP — native C++ core.
//
// Role parity with the reference cpp/src/dual_simplex/ (solve.hpp
// solve_linear_program, phase1/phase2.cpp pricing + ratio tests,
// right_looking_lu.cpp + basis_updates.cpp factorization,
// crossover.hpp:38 crossover) — re-designed, not ported. A
// bounded-variable dual simplex over the standard form
//
//     min c^T x   s.t.  A x - s = 0,   lv <= x <= uv,  lc <= s <= uc
//
// (ranged rows become bounded logicals), with:
//   * sparse LU basis (singleton peel + bump elimination, sparse_lu.hpp)
//     and product-form eta updates, refactorization every 100 pivots
//   * dual Devex pricing (Forrest–Goldfarb reference-framework weights)
//   * bound-flipping (long-step) dual ratio test
//   * incremental reduced-cost and primal updates (no per-pivot
//     re-pricing)
//   * warm starts: an initial basis + nonbasic placement can be supplied
//     (B&B node re-solves), and a PDLP interior point can be crossed
//     over: placements from the sign of d* = c - A^T y*, ties broken
//     toward the nearer bound of x* (reference crossover.hpp:38).
//
// The initial slack basis is made dual-feasible by placing structurals
// at the bound matching the sign of their reduced cost; free variables
// with irreparable dual infeasibility get temporary big bounds (flagged:
// if active at the optimum the LP is reported unbounded).
//
// C ABI at the bottom (ds_solve / ds_solve_adv) for ctypes.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <utility>
#include <vector>

#include "sparse_lu.hpp"

namespace tpu_simplex {

constexpr double kInf = std::numeric_limits<double>::infinity();
// Runtime-configurable solver options (reference exposes ~30 fields in
// simplex_solver_settings.hpp:35-67; the ds_set_options C entry at the
// bottom sets the ones this engine consumes). Atomics: concurrent node
// solves (strong-branching thread pool) read these in the pivot loop
// while another thread may call ds_set_options; implicit conversion
// keeps expression sites unchanged.
inline std::atomic<double> kBig{1e9};     // temporary bound for free vars
inline std::atomic<double> kPivTol{1e-9}; // minimal pivot magnitude
inline std::atomic<double> kFeasTol{1e-7};// primal bound tolerance
inline std::atomic<double> kDualTol{1e-9};// reduced-cost tolerance
inline std::atomic<int> kRefactorFreq{100};// simplex_solver_settings.hpp

enum Status : int {
  kOptimal = 0,
  kInfeasible = 1,
  kUnbounded = 2,
  kIterLimit = 3,
  kTimeLimit = 4,
  kNumerical = 5,
  kHalted = 6,
};

// nonbasic/basic status codes shared with the Python bindings
enum VStat : int8_t {
  kAtLower = 0,
  kAtUpper = 1,
  kBasic = 2,
};

struct Problem {
  int m = 0;  // rows
  int n = 0;  // structural columns
  std::vector<int> col_ptr, row_ind;  // CSC of A (structurals)
  std::vector<double> values;
  std::vector<double> c;       // n
  std::vector<double> lo, up;  // n + m (structurals then logicals)
};

class DualSimplex {
 public:
  explicit DualSimplex(const Problem& p) : p_(p), m_(p.m), nt_(p.n + p.m) {}

  // vstat_in: optional warm start (n+m int8, kBasic count may differ
  // from m — repaired). x_hint/y_hint: optional crossover point.
  int Solve(double time_limit, int iter_limit, const volatile int* halt,
            const int8_t* vstat_in, const double* x_hint,
            const double* y_hint, std::vector<double>* x_out,
            std::vector<double>* y_out, std::vector<double>* dj_out,
            std::vector<int8_t>* vstat_out, int* iters_out) {
    const auto t0 = std::chrono::steady_clock::now();
    InitBounds();
    InitBasis(vstat_in, x_hint, y_hint);
    if (!Refactorize()) return Finish(kNumerical, 0, x_out, y_out, dj_out,
                                      vstat_out, iters_out);
    ComputeXb();
    if (crash_used_) {
      // an ill-conditioned crossover crash basis shows up as absurd
      // basic values: fall back to the slack basis, keeping the
      // PDLP-derived nonbasic placements (still a warm start)
      double mx = 0.0;
      for (int i = 0; i < m_; ++i) mx = std::max(mx, std::fabs(xb_[i]));
      if (!(mx < 1e12)) {
        std::fill(in_basis_.begin(), in_basis_.end(), 0);
        for (int j = 0; j < nt_; ++j) {
          at_lower_[j] = pref_lower_[j];
          at_upper_[j] = !pref_lower_[j];
        }
        for (int i = 0; i < m_; ++i) {
          basis_[i] = p_.n + i;
          in_basis_[p_.n + i] = 1;
          at_lower_[p_.n + i] = at_upper_[p_.n + i] = 0;
        }
        if (!Refactorize())
          return Finish(kNumerical, 0, x_out, y_out, dj_out, vstat_out,
                        iters_out);
        ComputeXb();
      }
    }
    ComputeDualsAndPrices();
    RepairDualFeasibility();
    PerturbCosts();
    if (perturbed_) {
      ComputeDualsAndPrices();
      RepairDualFeasibility();
    }
    gamma_.assign(m_, 1.0);

    int iter = 0;
    int status = kOptimal;
    int numerical_retries = 0;
    std::vector<double> rho(m_), alpha_col(m_), flip_col(m_);
    std::vector<double> alpha(nt_);
    std::vector<int> cand;
    cand.reserve(256);

    while (true) {
      if (iter >= iter_limit) { status = kIterLimit; break; }
      if ((iter & 31) == 0) {
        if (halt && *halt) { status = kHalted; break; }
        const double el = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        if (el > time_limit) { status = kTimeLimit; break; }
        // a numerically blown-up basis shows as nonfinite basic values;
        // on a FREE basic column this is otherwise silent (no bound to
        // violate), and an ±inf x_B poisons the reported solution
        // (bitten on 50v-10-free-bound: x[374]=+inf at "optimal")
        bool bad = false;
        for (int i = 0; i < m_; ++i)
          if (!std::isfinite(xb_[i])) { bad = true; break; }
        if (bad) {
          if (!Refactorize()) { status = kNumerical; break; }
          ComputeXb();
          ComputeDualsAndPrices();
          bool still_bad = false;
          for (int i = 0; i < m_; ++i)
            if (!std::isfinite(xb_[i])) { still_bad = true; break; }
          if (still_bad) { status = kNumerical; break; }
        }
      }

      // ---- leaving row: dual Devex, max violation^2 / gamma ----
      int r = -1;
      double best_score = 0.0;
      double delta = 0.0;  // +1: below lower, -1: above upper
      for (int i = 0; i < m_; ++i) {
        const int j = basis_[i];
        const double v = xb_[i];
        double infeas = 0.0, d = 0.0;
        if (v < lo_[j] - kFeasTol) { infeas = lo_[j] - v; d = +1.0; }
        else if (v > up_[j] + kFeasTol) { infeas = v - up_[j]; d = -1.0; }
        else continue;
        const double score = infeas * infeas / gamma_[i];
        if (score > best_score) { best_score = score; r = i; delta = d; }
      }
      if (r < 0) {
        // primal feasible + dual feasible -> optimal, but verify against
        // a FRESH factorization first: incremental x_B can drift
        if (lu_.n_updates() > 0) {
          if (!Refactorize()) { status = kNumerical; break; }
          ComputeXb();
          ComputeDualsAndPrices();
          continue;  // re-scan with exact values
        }
        if (perturbed_) {
          // optimal under the PERTURBED costs: restore the true ones
          // and run a short repair/pivot tail under them
          perturbed_ = false;
          RestoreCosts();
          ComputeDualsAndPrices();
          RepairDualFeasibility();
          continue;
        }
        if (ReleaseParkedFree()) {
          ComputeXb();
          continue;  // a parked free column matters after all
        }
        {
          // optimality may not be claimed with a nonfinite basic value
          // (free basics have no bound to flag the blow-up)
          bool bad = false;
          for (int i = 0; i < m_; ++i)
            if (!std::isfinite(xb_[i])) { bad = true; break; }
          if (bad) { status = kNumerical; }
        }
        break;
      }

      // ---- pivot row: rho = B^-T e_r; alpha'_j = delta * a_j^T rho ----
      std::fill(rho.begin(), rho.end(), 0.0);
      rho[r] = 1.0;
      lu_.Btran(rho);
      cand.clear();
      for (int j = 0; j < nt_; ++j) {
        if (in_basis_[j]) continue;
        double a;
        if (j < p_.n) {
          a = 0.0;
          for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
            a += p_.values[k] * rho[p_.row_ind[k]];
        } else {
          a = -rho[j - p_.n];
        }
        a *= delta;
        alpha[j] = a;
        if (at_lower_[j] ? (a < -kPivTol) : (a > kPivTol)) cand.push_back(j);
      }

      const int leave = basis_[r];
      double violation = (delta > 0) ? lo_[leave] - xb_[r]
                                     : xb_[r] - up_[leave];
      if (cand.empty()) {
        if (lu_.n_updates() > 0) {
          // verify the certificate against a fresh factorization
          if (!Refactorize()) { status = kNumerical; break; }
          ComputeXb();
          ComputeDualsAndPrices();
          continue;
        }
        if (violation < 1e-6) { status = kOptimal; break; }
        if (std::getenv("DS_DEBUG"))
          std::fprintf(stderr, "[ds] iter %d infeasible: empty cand, row %d"
                       " viol %g\n", iter, r, violation);
        status = kInfeasible;  // dual ray certifies primal infeasibility
        break;
      }

      // ---- bound-flipping dual ratio test ----
      // ratio_j = d_j / (-alpha'_j) >= 0 for every candidate (at lower:
      // d >= 0, alpha' < 0; at upper: d <= 0, alpha' > 0)
      std::sort(cand.begin(), cand.end(), [&](int a1, int b1) {
        const double ra = dj_[a1] / (-alpha[a1]);
        const double rb = dj_[b1] / (-alpha[b1]);
        return ra < rb;
      });
      int q = -1;
      size_t iq = 0;
      std::vector<int> flips;
      double remaining = violation;
      for (size_t t2 = 0; t2 < cand.size(); ++t2) {
        const int j = cand[t2];
        const double span = up_[j] - lo_[j];
        const double room = std::fabs(alpha[j]) * span;
        if (!std::isfinite(span) || remaining - room <= kFeasTol) {
          q = j;
          iq = t2;
          break;
        }
        flips.push_back(j);
        remaining -= room;
      }
      if (q < 0) {
        // every candidate bound-flips and violation remains: dual ray
        if (lu_.n_updates() > 0) {
          if (!Refactorize()) { status = kNumerical; break; }
          ComputeXb();
          ComputeDualsAndPrices();
          continue;
        }
        if (std::getenv("DS_DEBUG"))
          std::fprintf(stderr, "[ds] iter %d infeasible: all %zu cands"
                       " flip, viol left %g\n", iter, cand.size(),
                       remaining);
        status = kInfeasible;
        break;
      }
      // Harris-style tie-break (reference phase2.cpp two-pass ratio
      // test): among candidates whose ratio is within a dual-tolerance
      // band of the blocking ratio, pick the numerically largest pivot
      // |alpha| — degenerate ties no longer force tiny pivots.
      {
        const double theta_q = std::max(0.0, dj_[q] / (-alpha[q]));
        double best_a = std::fabs(alpha[q]);
        for (size_t t2 = iq + 1; t2 < cand.size(); ++t2) {
          const int j = cand[t2];
          const double aj = std::fabs(alpha[j]);
          const double rj = dj_[j] / (-alpha[j]);
          if (rj > theta_q + 1e-9 / std::max(aj, 1e-12)) break;
          if (aj > best_a) { best_a = aj; q = j; }
        }
      }
      const double theta_d = std::max(0.0, dj_[q] / (-alpha[q]));

      // ---- apply bound flips (batch FTRAN of the combined column) ----
      if (!flips.empty()) {
        std::fill(flip_col.begin(), flip_col.end(), 0.0);
        for (const int j : flips) {
          const double dx = at_lower_[j] ? (up_[j] - lo_[j])
                                         : (lo_[j] - up_[j]);
          if (j < p_.n) {
            for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
              flip_col[p_.row_ind[k]] += p_.values[k] * dx;
          } else {
            flip_col[j - p_.n] -= dx;
          }
          at_lower_[j] ^= 1;
          at_upper_[j] ^= 1;
        }
        lu_.Ftran(flip_col);
        for (int i = 0; i < m_; ++i) xb_[i] -= flip_col[i];
      }

      // ---- FTRAN entering column ----
      std::fill(alpha_col.begin(), alpha_col.end(), 0.0);
      if (q < p_.n) {
        for (int k = p_.col_ptr[q]; k < p_.col_ptr[q + 1]; ++k)
          alpha_col[p_.row_ind[k]] = p_.values[k];
      } else {
        alpha_col[q - p_.n] = -1.0;
      }
      lu_.Ftran(alpha_col);
      const double ar = alpha_col[r];
      if (std::fabs(ar) < kPivTol) {
        // numerically unusable pivot: refactorize and retry the row
        if (++numerical_retries > 16 || !Refactorize()) {
          status = kNumerical;
          break;
        }
        ComputeXb();
        ComputeDualsAndPrices();
        continue;
      }
      numerical_retries = 0;

      // ---- primal step ----
      const double target = (delta > 0) ? lo_[leave] : up_[leave];
      const double t = (xb_[r] - target) / ar;
      for (int i = 0; i < m_; ++i) xb_[i] -= t * alpha_col[i];
      const double enter_from = at_lower_[q] ? lo_[q] : up_[q];

      // ---- dual update: d_j += theta_d * alpha'_j; y -= theta_d*δ*rho
      // (keeps reported duals exact between refactorizations) ----
      if (theta_d != 0.0) {
        for (int j = 0; j < nt_; ++j) {
          if (!in_basis_[j]) dj_[j] += theta_d * alpha[j];
        }
        for (int i = 0; i < m_; ++i) y_[i] -= theta_d * delta * rho[i];
      }
      dj_[q] = 0.0;
      dj_[leave] = theta_d * delta;

      // ---- Devex weights (dual Forrest–Goldfarb approximation) ----
      const double gr = std::max(gamma_[r] / (ar * ar), 1.0);
      for (int i = 0; i < m_; ++i) {
        if (i == r || alpha_col[i] == 0.0) continue;
        const double w = (alpha_col[i] / ar) * (alpha_col[i] / ar) *
                         gamma_[r];
        if (w > gamma_[i]) gamma_[i] = w;
      }
      gamma_[r] = gr;
      if (gr > 1e8) gamma_.assign(m_, 1.0);

      if (std::getenv("DS_DEBUG") && (iter % 100) == 0) {
        double mx = 0;
        for (int i = 0; i < m_; ++i) mx = std::max(mx, std::fabs(xb_[i]));
        std::fprintf(stderr,
                     "[ds] it=%d viol=%.3e theta_d=%.3e t=%.3e ar=%.3e "
                     "flips=%zu max|xb|=%.3e etas=%d\n",
                     iter, violation, theta_d, t, ar, flips.size(), mx,
                     lu_.n_updates());
      }
      // ---- basis exchange ----
      in_basis_[leave] = 0;
      at_lower_[leave] = (delta > 0) ? 1 : 0;
      at_upper_[leave] = (delta > 0) ? 0 : 1;
      in_basis_[q] = 1;
      at_lower_[q] = at_upper_[q] = 0;
      basis_[r] = q;
      xb_[r] = enter_from + t;

      if (!lu_.Update(r, alpha_col) ||
          lu_.n_updates() >= kRefactorFreq) {
        if (!Refactorize()) { status = kNumerical; break; }
        ComputeXb();
        ComputeDualsAndPrices();
      }
      ++iter;
    }
    return Finish(status, iter, x_out, y_out, dj_out, vstat_out,
                  iters_out);
  }

 private:
  void InitBounds() {
    lo_ = p_.lo;
    up_ = p_.up;
    RestoreCosts();
    used_big_bounds_ = false;
    perturbed_ = false;
    shift_rounds_ = 0;
    fake_bound_.assign(nt_, 0);
  }

  // working costs: structurals from p_.c, slacks 0 — both shiftable
  // (dual phase-1 by cost shifting, see RepairDualFeasibility)
  void RestoreCosts() {
    c_.assign(nt_, 0.0);
    std::copy(p_.c.begin(), p_.c.end(), c_.begin());
  }

  // Cost perturbation (dual anti-degeneracy). Massively degenerate LPs
  // (set covering: cod105 burned 20k+ iterations AT the optimum without
  // terminating) make the dual ratio test take zero-length steps; a
  // tiny placement-consistent cost perturbation breaks the ties
  // (reference phase2.cpp uses Harris + bound shifting for the same
  // purpose; HiGHS/ Koberstein-style dual codes perturb costs). The
  // direction follows the initial placement so initial dual
  // feasibility is preserved; costs are RESTORED at the first
  // optimality claim and a short repair loop re-establishes dual
  // feasibility under the true costs.
  void PerturbCosts() {
    if (nt_ <= 50) return;
    uint64_t s = 0x9e3779b97f4a7c15ull;
    for (int j = 0; j < p_.n; ++j) {
      if (in_basis_[j]) continue;
      s ^= s << 13; s ^= s >> 7; s ^= s << 17;
      const double u = 0.5 + 0.5 * double(s % 1024) / 1024.0;
      const double eps = 1e-7 * (1.0 + std::fabs(c_[j])) * u;
      if (at_lower_[j]) c_[j] += eps;       // dj moves up: still >= 0
      else if (at_upper_[j]) c_[j] -= eps;  // dj moves down: still <= 0
    }
    perturbed_ = true;
  }

  void InitBasis(const int8_t* vstat_in, const double* x_hint,
                 const double* y_hint) {
    basis_.assign(m_, 0);
    in_basis_.assign(nt_, 0);
    at_lower_.assign(nt_, 0);
    at_upper_.assign(nt_, 0);

    if (vstat_in != nullptr) {
      // warm basis: honor kBasic rows up to m, fill the rest with slacks
      int nb = 0;
      std::vector<uint8_t> row_used(m_, 0);
      for (int j = 0; j < nt_ && nb < m_; ++j) {
        if (vstat_in[j] == kBasic) {
          basis_[nb++] = j;
          in_basis_[j] = 1;
        }
      }
      for (int j = 0; j < nt_; ++j) {
        if (in_basis_[j]) continue;
        if (vstat_in[j] == kAtUpper && std::isfinite(up_[j]))
          at_upper_[j] = 1;
        else if (std::isfinite(lo_[j]))
          at_lower_[j] = 1;
        else if (std::isfinite(up_[j]))
          at_upper_[j] = 1;
        else
          at_lower_[j] = 1;  // free: big bounds below
      }
      for (int i = nb; i < m_; ++i) {
        // complete with unused logicals
        for (int k = 0; k < m_; ++k) {
          if (!in_basis_[p_.n + k]) {
            basis_[i] = p_.n + k;
            in_basis_[p_.n + k] = 1;
            at_lower_[p_.n + k] = at_upper_[p_.n + k] = 0;
            break;
          }
        }
      }
    } else if (y_hint != nullptr) {
      // crossover crash (reference crossover.hpp:38 — push the interior
      // PDLP point to a vertex): variables where the PDLP point is
      // INTERIOR become basic (most-interior first; rank deficiency is
      // repaired by the LU with slack swaps), so the crash duals
      // approximate y* and the dual simplex starts near-optimal.
      // Nonbasic placement: sign of d* = c - A^T y*, ties toward the
      // bound nearer to the PDLP value.
      std::vector<double> z(nt_, 0.0);  // PDLP value of every column
      if (x_hint != nullptr) {
        for (int j = 0; j < p_.n; ++j) {
          z[j] = x_hint[j];
          for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
            z[p_.n + p_.row_ind[k]] += p_.values[k] * x_hint[j];
        }
      }
      std::vector<double> dstar(nt_);
      for (int j = 0; j < p_.n; ++j) {
        double d = p_.c[j];
        for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
          d -= p_.values[k] * y_hint[p_.row_ind[k]];
        dstar[j] = d;
      }
      for (int i = 0; i < m_; ++i) dstar[p_.n + i] = y_hint[i];
      // interiorness: distance of the PDLP value to its nearest bound.
      // The PDLP point is only ~1e-4 accurate, so "interior" must clear
      // the solver fuzz (relative threshold), and a basic candidate must
      // also look dual-degenerate (|d*| small) — a column with a clearly
      // nonzero reduced cost is nonbasic at every optimum.
      std::vector<std::pair<double, int>> rank;
      rank.reserve(nt_);
      if (x_hint != nullptr) {
        for (int j = 0; j < nt_; ++j) {
          const double dlo = std::isfinite(lo_[j]) ? z[j] - lo_[j] : kBig.load();
          const double dup = std::isfinite(up_[j]) ? up_[j] - z[j] : kBig.load();
          const double interior = std::min(dlo, dup);
          const double fuzz = 1e-3 * (1.0 + std::fabs(z[j]));
          const double dtol =
              1e-3 * (1.0 + (j < p_.n ? std::fabs(p_.c[j]) : 0.0));
          if (interior > fuzz && std::fabs(dstar[j]) < dtol)
            rank.emplace_back(-interior, j);
        }
        std::sort(rank.begin(), rank.end());
      }
      // preferred placement of EVERY column by d* sign (kept for the
      // ill-conditioned-crash fallback in Solve)
      pref_lower_.assign(nt_, 1);
      for (int j = 0; j < nt_; ++j) {
        const double d = dstar[j];
        bool to_lower;
        if (d > kDualTol) to_lower = true;
        else if (d < -kDualTol) to_lower = false;
        else if (x_hint != nullptr && std::isfinite(lo_[j]) &&
                 std::isfinite(up_[j]))
          to_lower = (z[j] - lo_[j] <= up_[j] - z[j]);
        else to_lower = std::isfinite(lo_[j]);
        pref_lower_[j] = (to_lower && std::isfinite(lo_[j])) ||
                         !std::isfinite(up_[j]);
      }
      crash_used_ = true;
      int nb = 0;
      for (const auto& e : rank) {
        if (nb >= m_) break;
        basis_[nb++] = e.second;
        in_basis_[e.second] = 1;
      }
      for (int i = 0; i < m_ && nb < m_; ++i) {
        if (!in_basis_[p_.n + i]) {
          basis_[nb++] = p_.n + i;
          in_basis_[p_.n + i] = 1;
        }
      }
      for (int j = 0; j < nt_; ++j) {
        if (in_basis_[j]) continue;
        if (pref_lower_[j]) at_lower_[j] = 1;
        else at_upper_[j] = 1;
      }
    } else {
      // cold start. FREE columns (no finite bound either side) enter
      // the initial basis: a NONBASIC free column needs d_j = 0 for
      // dual feasibility, which a cost-sign placement cannot provide —
      // the old code gave them ±kBig sentinel bounds, poisoning duals
      // and the unboundedness test on free-variable instances
      // (reference runs a phase-1 instead, dual_simplex/phase1.cpp).
      // Each free column claims a distinct pivot row greedily by
      // magnitude; slacks fill the remaining rows and Refactorize's
      // rank repair resolves any linear dependence.
      std::vector<char> row_used(m_, 0);
      for (int j = 0; j < p_.n; ++j) {
        if (std::isfinite(lo_[j]) || std::isfinite(up_[j])) continue;
        int best_row = -1;
        double best = 1e-8;
        for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k) {
          const int r = p_.row_ind[k];
          const double a = std::fabs(p_.values[k]);
          if (!row_used[r] && a > best) { best = a; best_row = r; }
        }
        if (best_row < 0) continue;  // leftover free: kBig fallback
        row_used[best_row] = 1;
        basis_[best_row] = j;
        in_basis_[j] = 1;
      }
      for (int i = 0; i < m_; ++i) {
        if (row_used[i]) continue;
        basis_[i] = p_.n + i;
        in_basis_[p_.n + i] = 1;
      }
      // dual-feasible placement by cost sign for ALL nonbasics —
      // including the slacks of rows claimed by free columns (leaving
      // them unplaced read lo_=-inf in ComputeXb and poisoned x_B on
      // free-variable instances)
      for (int j = 0; j < nt_; ++j) {
        if (in_basis_[j]) continue;
        const double cj = j < p_.n ? p_.c[j] : 0.0;
        if (cj >= 0) {
          if (std::isfinite(lo_[j])) at_lower_[j] = 1;
          else at_upper_[j] = 1;
        } else {
          if (std::isfinite(up_[j])) at_upper_[j] = 1;
          else at_lower_[j] = 1;
        }
      }
    }
    // Nonbasics placed on an infinite side: semi-bounded ones flip to
    // their finite side (dual repair shifts the cost if that side is
    // dual-infeasible); LEFTOVER FREE columns are PARKED fixed at 0
    // (fake_bound_=2). A fixed column is always dual-feasible and is
    // never selected by the ratio test, so it stays parked; if its
    // true reduced cost is nonzero at the optimality claim,
    // ReleaseParkedFree falls back to the old big-bound treatment for
    // just that column (rare). This replaces the blanket ±kBig bounds
    // the old code used — the reference's phase-1 territory
    // (dual_simplex/phase1.cpp).
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      const bool lofin = std::isfinite(lo_[j]);
      const bool upfin = std::isfinite(up_[j]);
      if (at_lower_[j] && !lofin) {
        if (upfin) {
          at_lower_[j] = 0;
          at_upper_[j] = 1;
        } else {
          lo_[j] = up_[j] = 0.0;
          fake_bound_[j] = 2;
        }
      } else if (at_upper_[j] && !upfin) {
        if (lofin) {
          at_upper_[j] = 0;
          at_lower_[j] = 1;
        } else {
          lo_[j] = up_[j] = 0.0;
          at_upper_[j] = 0;
          at_lower_[j] = 1;
          fake_bound_[j] = 2;
        }
      }
    }
  }

  // At the optimality claim: a PARKED free column (fixed at 0,
  // fake_bound_=2) whose true reduced cost is decisively nonzero must
  // be freed — it gets the legacy big-bound treatment on its
  // dual-feasible side and the main loop resumes (its movement either
  // re-optimizes or exposes unboundedness via BigBoundActive).
  bool ReleaseParkedFree() {
    bool any = false;
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j] || fake_bound_[j] != 2) continue;
      if (std::fabs(dj_[j]) <= 1e-7) continue;
      fake_bound_[j] = 1;
      used_big_bounds_ = true;
      if (dj_[j] < 0) {  // wants to increase: park at +kBig (d<=0 ok)
        lo_[j] = -kInf;
        up_[j] = kBig;
        at_lower_[j] = 0;
        at_upper_[j] = 1;
      } else {           // wants to decrease: park at -kBig (d>=0 ok)
        up_[j] = kInf;
        lo_[j] = -kBig;
        at_upper_[j] = 0;
        at_lower_[j] = 1;
      }
      any = true;
    }
    return any;
  }

  bool Refactorize() {
    for (int attempt = 0; attempt < 8; ++attempt) {
      BasisColumns B;
      B.ptr.assign(m_ + 1, 0);
      for (int i = 0; i < m_; ++i) {
        const int j = basis_[i];
        B.ptr[i + 1] = B.ptr[i] +
            (j < p_.n ? p_.col_ptr[j + 1] - p_.col_ptr[j] : 1);
      }
      B.ind.resize(B.ptr[m_]);
      B.val.resize(B.ptr[m_]);
      for (int i = 0; i < m_; ++i) {
        const int j = basis_[i];
        int w = B.ptr[i];
        if (j < p_.n) {
          for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k) {
            B.ind[w] = p_.row_ind[k];
            B.val[w] = p_.values[k];
            ++w;
          }
        } else {
          B.ind[w] = j - p_.n;
          B.val[w] = -1.0;
        }
      }
      std::vector<int> replaced, repl_row;
      if (lu_.Factorize(B, m_, &replaced, &repl_row)) return true;
      // rank repair: evicted columns become nonbasic at a finite bound;
      // fresh slack columns enter (reference initial_basis.cpp repair)
      for (size_t t = 0; t < replaced.size(); ++t) {
        const int pos = replaced[t];
        const int out = basis_[pos];
        const int slack = p_.n + repl_row[t];
        in_basis_[out] = 0;
        if (std::isfinite(lo_[out])) at_lower_[out] = 1;
        else if (std::isfinite(up_[out])) at_upper_[out] = 1;
        else {  // evicted free column: park fixed at 0 (see InitBasis)
          lo_[out] = up_[out] = 0.0;
          fake_bound_[out] = 2;
          at_lower_[out] = 1;
        }
        // the replacement slack may be nonbasic: pull it in
        in_basis_[slack] = 1;
        at_lower_[slack] = at_upper_[slack] = 0;
        basis_[pos] = slack;
      }
      if (replaced.empty()) return false;  // genuine failure
    }
    return false;
  }

  void ComputeXb() {
    // x_B = B^-1 (0 - N x_N)
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
    lu_.Ftran(rhs);
    xb_ = rhs;
  }

  void ComputeDualsAndPrices() {
    y_.assign(m_, 0.0);
    for (int i = 0; i < m_; ++i) {
      const int j = basis_[i];
      y_[i] = c_[j];
    }
    // y holds c_B in basis-position order; but Btran wants row-space rhs.
    // c_B is indexed by basis POSITION and B^T y = c_B couples position k
    // to row ... — Btran solves B^T y = c where c is given by basis
    // position? No: (B^T y)_k = column k of B dot y = c_B[k]. Our Btran
    // takes the right-hand side indexed by basis position via the
    // column ordering: pass c_B as a vector indexed by position.
    lu_.Btran(y_);
    dj_.assign(nt_, 0.0);
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      double s;
      const double cj = c_[j];
      if (j < p_.n) {
        s = 0.0;
        for (int k = p_.col_ptr[j]; k < p_.col_ptr[j + 1]; ++k)
          s += p_.values[k] * y_[p_.row_ind[k]];
      } else {
        s = -y_[j - p_.n];
      }
      dj_[j] = cj - s;
    }
  }

  // Dual feasibility repair: a nonbasic at the wrong bound for its
  // reduced-cost sign is flipped to the other bound when finite. When
  // the other side is INFINITE the cost is SHIFTED instead (dual
  // phase-1 by cost shifting, the Koberstein/HiGHS device; reference
  // runs a composite-objective phase-1, dual_simplex/phase1.cpp): the
  // shifted d_j becomes a harmless +-eps, the true costs return at the
  // optimality claim (same restore loop as the anti-degeneracy
  // perturbation), and the shifted column has usually entered the
  // basis by then. Temporary kBig bounds remain only as a last resort
  // after `kMaxShiftRounds` restore loops failed to converge.
  void RepairDualFeasibility() {
    const bool allow_shift = shift_rounds_ < kMaxShiftRounds;
    bool shifted = false;
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      if (at_lower_[j] && dj_[j] < -kDualTol) {
        if (std::isfinite(up_[j])) {
          at_lower_[j] = 0;
          at_upper_[j] = 1;
        } else if (allow_shift) {
          c_[j] += -dj_[j] + kShiftEps;  // d_j -> +eps, stay at lower
          dj_[j] = kShiftEps;
          shifted = true;
        } else {
          up_[j] = kBig;
          used_big_bounds_ = true;
          fake_bound_[j] = 1;
          at_lower_[j] = 0;
          at_upper_[j] = 1;
        }
      } else if (at_upper_[j] && dj_[j] > kDualTol) {
        if (std::isfinite(lo_[j])) {
          at_upper_[j] = 0;
          at_lower_[j] = 1;
        } else if (allow_shift) {
          c_[j] -= dj_[j] + kShiftEps;  // d_j -> -eps, stay at upper
          dj_[j] = -kShiftEps;
          shifted = true;
        } else {
          lo_[j] = -kBig;
          used_big_bounds_ = true;
          fake_bound_[j] = 1;
          at_upper_[j] = 0;
          at_lower_[j] = 1;
        }
      }
    }
    if (shifted) {
      if (std::getenv("DS_DEBUG"))
        std::fprintf(stderr, "[ds] cost shift round %d\n", shift_rounds_);
      ++shift_rounds_;
      perturbed_ = true;  // the optimality claim restores + re-repairs
    }
    ComputeXb();  // placements changed
  }

  bool BigBoundActive() const {
    for (int i = 0; i < m_; ++i) {
      if (std::fabs(std::fabs(xb_[i]) - kBig) < 1e-3) return true;
    }
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      const double v = at_upper_[j] ? up_[j] : lo_[j];
      // a sentinel-parked nonbasic is an unboundedness WITNESS only
      // under reduced-cost pressure into the sentinel; with |d_j|~0 it
      // is merely dual-degenerate (cleaned to 0 by Finish)
      if (std::fabs(std::fabs(v) - kBig) < 1e-3 &&
          std::fabs(dj_[j]) > 1e-7)
        return true;
    }
    return false;
  }

  int Finish(int status, int iter, std::vector<double>* x_out,
             std::vector<double>* y_out, std::vector<double>* dj_out,
             std::vector<int8_t>* vstat_out, int* iters_out) {
    if (iters_out) *iters_out = iter;
    // primal cleanup (reference primal.cpp role): a nonbasic FREE
    // variable parked at a sentinel ±kBig bound with ~zero reduced
    // cost is dual-degenerate — any value is optimal, so move it to 0
    // and let the basics re-absorb A_j * delta; the reported solution
    // then carries no 1e9 artifacts.
    if (status == kOptimal && used_big_bounds_) {
      bool cleaned = false;
      for (int j = 0; j < nt_; ++j) {
        if (in_basis_[j] || !fake_bound_[j]) continue;
        if (std::fabs(dj_[j]) <= 1e-7) {
          if (at_lower_[j]) lo_[j] = 0.0;
          else up_[j] = 0.0;
          cleaned = true;
        }
      }
      if (cleaned) ComputeXb();
    }
    // map y back to ROW space: Btran produced y indexed by row already
    std::vector<double> z(nt_, 0.0);
    for (int j = 0; j < nt_; ++j) {
      if (in_basis_[j]) continue;
      double v = at_upper_[j] ? up_[j] : lo_[j];
      if (!std::isfinite(v)) {
        // a nonbasic parked on an infinite side is dual-degenerate
        // bookkeeping residue — 0 is an equally optimal placement, and
        // reporting ±inf would poison every downstream consumer
        // (MIP roundings, LP completions, warm starts)
        if (std::getenv("DS_DEBUG"))
          std::fprintf(stderr, "[ds] nonbasic %d at infinite %s dj=%g\n",
                       j, at_upper_[j] ? "upper" : "lower", dj_[j]);
        v = 0.0;
      }
      z[j] = v;
    }
    for (int i = 0; i < m_; ++i) z[basis_[i]] = xb_[i];
    x_out->assign(z.begin(), z.begin() + p_.n);
    *y_out = y_;
    dj_out->assign(dj_.begin(), dj_.begin() + p_.n);
    if (vstat_out) {
      vstat_out->assign(nt_, kAtLower);
      for (int j = 0; j < nt_; ++j) {
        if (in_basis_[j]) (*vstat_out)[j] = kBasic;
        else if (at_upper_[j]) (*vstat_out)[j] = kAtUpper;
      }
    }
    if (status == kOptimal && used_big_bounds_ && BigBoundActive())
      return kUnbounded;
    return status;
  }

 public:
  bool used_big_bounds() const { return used_big_bounds_; }

 private:
  const Problem& p_;
  int m_, nt_;
  SparseLU lu_;
  std::vector<int> basis_;
  std::vector<uint8_t> in_basis_, at_lower_, at_upper_;
  std::vector<double> lo_, up_;
  std::vector<double> c_;  // working costs (perturbation-aware)
  bool perturbed_ = false;
  std::vector<double> xb_, y_, dj_, gamma_;
  std::vector<uint8_t> pref_lower_;
  bool crash_used_ = false;
  bool used_big_bounds_ = false;
  // dual phase-1 cost shifting (RepairDualFeasibility)
  static constexpr double kShiftEps = 1e-7;
  static constexpr int kMaxShiftRounds = 8;
  int shift_rounds_ = 0;
  std::vector<uint8_t> fake_bound_;  // sentinel ±kBig bound holders
};

}  // namespace tpu_simplex

namespace tpu_simplex {

// --------------------------------------------------------------- presolve
// Host presolve (reference cpp/src/dual_simplex/presolve.cpp,
// singletons.cpp, scaling.cpp roles):
//  - singleton-row implied bound tightening: a row with one nonzero is a
//    bound on its variable; tightening it up front removes degenerate
//    ratio-test pivots (the row itself stays, served by its slack);
//  - geometric-mean equilibration: A' = R A C with 3 alternating passes
//    of row/col scales 1/sqrt(min*max |a|) — stabilizes badly scaled
//    instances (kBig bound handling in particular).
// Returns false when implied bounds prove infeasibility.
struct Prescale {
  std::vector<double> rowscale, colscale;
};

inline bool PresolveInPlace(int m, int n, const int64_t* col_ptr,
                            const int64_t* row_ind,
                            std::vector<double>& values,
                            std::vector<double>& c,
                            std::vector<double>& var_lo,
                            std::vector<double>& var_up,
                            std::vector<double>& row_lo,
                            std::vector<double>& row_up,
                            Prescale* ps, bool do_scale) {
  const double kInf = std::numeric_limits<double>::infinity();
  // --- singleton-row implied bounds (on the ORIGINAL data)
  std::vector<int> row_nnz(m, 0);
  const int64_t nnz = col_ptr[n];
  for (int64_t k = 0; k < nnz; ++k) row_nnz[row_ind[k]]++;
  for (int j = 0; j < n; ++j) {
    for (int64_t k = col_ptr[j]; k < col_ptr[j + 1]; ++k) {
      const int i = static_cast<int>(row_ind[k]);
      if (row_nnz[i] != 1) continue;
      const double a = values[k];
      if (std::fabs(a) < 1e-12) continue;
      double lo = row_lo[i], up = row_up[i];
      double bl = (a > 0 ? lo : up) / a;   // lower implied bound
      double bu = (a > 0 ? up : lo) / a;
      if (std::isfinite(bl) && bl > var_lo[j]) var_lo[j] = bl;
      if (std::isfinite(bu) && bu < var_up[j]) var_up[j] = bu;
      if (var_lo[j] > var_up[j] + 1e-9) return false;
    }
  }
  // --- geometric-mean equilibration
  ps->rowscale.assign(m, 1.0);
  ps->colscale.assign(n, 1.0);
  std::vector<double> rmin(m), rmax(m);
  for (int pass = 0; pass < (do_scale ? 3 : 0); ++pass) {
    // columns
    for (int j = 0; j < n; ++j) {
      double mn = kInf, mx = 0.0;
      for (int64_t k = col_ptr[j]; k < col_ptr[j + 1]; ++k) {
        const double a = std::fabs(values[k]);
        if (a > 0) { mn = std::min(mn, a); mx = std::max(mx, a); }
      }
      if (mx <= 0.0) continue;
      const double s = 1.0 / std::sqrt(mn * mx);
      if (s > 0 && std::isfinite(s) && std::fabs(s - 1.0) > 1e-12) {
        for (int64_t k = col_ptr[j]; k < col_ptr[j + 1]; ++k)
          values[k] *= s;
        ps->colscale[j] *= s;
      }
    }
    // rows
    std::fill(rmin.begin(), rmin.end(), kInf);
    std::fill(rmax.begin(), rmax.end(), 0.0);
    for (int j = 0; j < n; ++j) {
      for (int64_t k = col_ptr[j]; k < col_ptr[j + 1]; ++k) {
        const double a = std::fabs(values[k]);
        const int i = static_cast<int>(row_ind[k]);
        if (a > 0) {
          rmin[i] = std::min(rmin[i], a);
          rmax[i] = std::max(rmax[i], a);
        }
      }
    }
    std::vector<double> rs(m, 1.0);
    bool any = false;
    for (int i = 0; i < m; ++i) {
      if (rmax[i] <= 0.0) continue;
      const double s = 1.0 / std::sqrt(rmin[i] * rmax[i]);
      if (s > 0 && std::isfinite(s) && std::fabs(s - 1.0) > 1e-12) {
        rs[i] = s;
        ps->rowscale[i] *= s;
        any = true;
      }
    }
    if (any) {
      for (int64_t k = 0; k < nnz; ++k) values[k] *= rs[row_ind[k]];
    }
  }
  // transform the problem into scaled space:
  //   x' = x / C  ->  var bounds divide by C;  c' = C c
  //   row activity' = R * activity -> row bounds multiply by R
  for (int j = 0; j < n; ++j) {
    const double cs = ps->colscale[j];
    c[j] *= cs;
    if (std::isfinite(var_lo[j])) var_lo[j] /= cs;
    if (std::isfinite(var_up[j])) var_up[j] /= cs;
  }
  for (int i = 0; i < m; ++i) {
    const double rsv = ps->rowscale[i];
    if (std::isfinite(row_lo[i])) row_lo[i] *= rsv;
    if (std::isfinite(row_up[i])) row_up[i] *= rsv;
  }
  return true;
}

}  // namespace tpu_simplex

extern "C" {

// Extended C ABI. vstat_in (nullable int8[n+m]): warm basis/placements.
// x_hint/y_hint (nullable double[n]/double[m]): PDLP crossover point.
// vstat_out (nullable int8[n+m]): final basis statuses.
int ds_solve_adv(int m, int n, const int64_t* col_ptr,
                 const int64_t* row_ind, const double* values,
                 const double* c, const double* var_lo,
                 const double* var_up, const double* row_lo,
                 const double* row_up, double time_limit, int iter_limit,
                 const int* halt, const int8_t* vstat_in,
                 const double* x_hint, const double* y_hint,
                 double* x_out, double* y_out, double* dj_out,
                 double* obj_out, int* iters_out, int8_t* vstat_out) {
  tpu_simplex::Problem p;
  p.m = m;
  p.n = n;
  p.col_ptr.assign(col_ptr, col_ptr + n + 1);
  const int64_t nnz = col_ptr[n];
  p.row_ind.assign(row_ind, row_ind + nnz);
  p.values.assign(values, values + nnz);
  p.c.assign(c, c + n);
  std::vector<double> vlo(var_lo, var_lo + n), vup(var_up, var_up + n);
  std::vector<double> rlo(row_lo, row_lo + m), rup(row_up, row_up + m);
  tpu_simplex::Prescale ps;
  // the crossover crash (y_hint, no warm basis) selects basic candidates
  // with PDLP-accuracy thresholds calibrated in USER units; geometric
  // scaling distorts them, so scale only cold / warm-basis solves
  const bool do_scale = (vstat_in != nullptr) || (y_hint == nullptr);
  if (!tpu_simplex::PresolveInPlace(m, n, col_ptr, row_ind, p.values,
                                    p.c, vlo, vup, rlo, rup, &ps,
                                    do_scale))
    return tpu_simplex::kInfeasible;
  p.lo.resize(n + m);
  p.up.resize(n + m);
  for (int j = 0; j < n; ++j) { p.lo[j] = vlo[j]; p.up[j] = vup[j]; }
  for (int i = 0; i < m; ++i) {
    p.lo[n + i] = rlo[i];
    p.up[n + i] = rup[i];
  }
  // warm hints move into scaled space
  std::vector<double> xh, yh;
  if (x_hint) {
    xh.assign(x_hint, x_hint + n);
    for (int j = 0; j < n; ++j) xh[j] /= ps.colscale[j];
  }
  if (y_hint) {
    yh.assign(y_hint, y_hint + m);
    for (int i = 0; i < m; ++i) yh[i] /= ps.rowscale[i];
  }
  tpu_simplex::DualSimplex solver(p);
  std::vector<double> x, y, dj;
  std::vector<int8_t> vstat;
  int iters = 0;
  extern std::atomic<int> g_last_used_big_bounds;
  const int status = solver.Solve(
      time_limit, iter_limit,
      reinterpret_cast<const volatile int*>(halt), vstat_in,
      x_hint ? xh.data() : nullptr, y_hint ? yh.data() : nullptr,
      &x, &y, &dj, vstat_out ? &vstat : nullptr, &iters);
  g_last_used_big_bounds = solver.used_big_bounds() ? 1 : 0;
  // unscale: x = C x', y = R y', dj = dj' / C
  for (int j = 0; j < n; ++j) x[j] *= ps.colscale[j];
  for (int i = 0; i < m; ++i) y[i] *= ps.rowscale[i];
  for (int j = 0; j < n; ++j) dj[j] /= ps.colscale[j];
  std::memcpy(x_out, x.data(), sizeof(double) * n);
  std::memcpy(y_out, y.data(), sizeof(double) * m);
  std::memcpy(dj_out, dj.data(), sizeof(double) * n);
  if (vstat_out && !vstat.empty())
    std::memcpy(vstat_out, vstat.data(), vstat.size());
  double obj = 0.0;
  for (int j = 0; j < n; ++j) obj += c[j] * x[j];
  *obj_out = obj;
  *iters_out = iters;
  return status;
}

// Options ABI (reference simplex_solver_settings.hpp fields consumed by
// this engine). Pass a negative value to leave a field unchanged.
void ds_set_options(double piv_tol, double feas_tol, double dual_tol,
                    int refactor_freq, double big_bound) {
  if (piv_tol > 0) tpu_simplex::kPivTol = piv_tol;
  if (feas_tol > 0) tpu_simplex::kFeasTol = feas_tol;
  if (dual_tol > 0) tpu_simplex::kDualTol = dual_tol;
  if (refactor_freq > 0) tpu_simplex::kRefactorFreq = refactor_freq;
  if (big_bound > 0) tpu_simplex::kBig = big_bound;
}

// Diagnostic: whether the LAST ds_solve_adv call in this process fell
// back to temporary kBig bounds for any free column (the reference
// avoids this with a real phase-1, dual_simplex/phase1.cpp; this
// engine instead places free columns in the initial basis — the
// fallback should stay cold, and tests assert it).
std::atomic<int> g_last_used_big_bounds{0};

int ds_last_used_big_bounds() { return g_last_used_big_bounds.load(); }

void ds_get_options(double* out5) {
  out5[0] = tpu_simplex::kPivTol;
  out5[1] = tpu_simplex::kFeasTol;
  out5[2] = tpu_simplex::kDualTol;
  out5[3] = static_cast<double>(tpu_simplex::kRefactorFreq);
  out5[4] = tpu_simplex::kBig;
}

// Original ABI (cold start), kept for compatibility.
int ds_solve(int m, int n, const int64_t* col_ptr, const int64_t* row_ind,
             const double* values, const double* c, const double* var_lo,
             const double* var_up, const double* row_lo,
             const double* row_up, double time_limit, int iter_limit,
             const int* halt, double* x_out, double* y_out,
             double* dj_out, double* obj_out, int* iters_out) {
  return ds_solve_adv(m, n, col_ptr, row_ind, values, c, var_lo, var_up,
                      row_lo, row_up, time_limit, iter_limit, halt,
                      nullptr, nullptr, nullptr, x_out, y_out, dj_out,
                      obj_out, iters_out, nullptr);
}

}  // extern "C"
