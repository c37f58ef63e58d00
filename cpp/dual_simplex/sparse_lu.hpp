// Sparse LU factorization for simplex basis matrices.
//
// Role parity with the reference cpp/src/dual_simplex/right_looking_lu.cpp
// (Markowitz LU), basis_solves.cpp / triangle_solve.cpp (FTRAN/BTRAN) and
// basis_updates.cpp (Forrest-Tomlin updates) — re-designed, not ported:
//
//   * Triangularization pre-pass: iteratively peel row/column singletons.
//     Simplex bases are slack-heavy and near-triangular, so this usually
//     eliminates almost everything; only the residual "bump" needs real
//     elimination. A peeled column needs NO elimination updates: a
//     row-singleton pivot's row appears in no later column (else it was
//     not a singleton), and a column-singleton pivot has an empty L
//     column — so the raw column entries split directly into U (earlier
//     pivot rows) and L (later rows).
//   * Bump: left-looking unit-L column elimination driven by a min-heap
//     over pivot positions present in the column pattern (Gilbert-
//     Peierls flavour), partial pivoting by max |value|.
//   * Updates: product-form (PFI) eta vectors; refactorization every
//     ~100 updates bounds eta growth (reference refactor frequency 100,
//     simplex_solver_settings.hpp).
//   * Rank repair: dependent columns abort the factorization and are
//     reported with fresh slack rows so the caller can patch the basis
//     and re-factorize (reference initial_basis.cpp crash repair).

#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <queue>
#include <vector>

namespace tpu_simplex {

// CSC storage of the m basis columns, in basis-position order.
struct BasisColumns {
  std::vector<int> ptr;  // m+1
  std::vector<int> ind;
  std::vector<double> val;
};

class SparseLU {
 public:
  // Factorize the m x m basis. Returns true on success. On rank
  // deficiency returns false with (replaced basis positions, fresh rows
  // whose slack should be swapped in); the caller patches and retries.
  bool Factorize(const BasisColumns& B, int m,
                 std::vector<int>* replaced,
                 std::vector<int>* replacement_row) {
    m_ = m;
    etas_.clear();
    n_updates_ = 0;
    replaced->clear();
    replacement_row->clear();

    // coalesce duplicate (row, col) entries — problem data may repeat
    // coordinates (MPS RANGES/duplicated coefficients sum)
    std::vector<int> colptr(m + 1, 0), colind;
    std::vector<double> colval;
    colind.reserve(B.ind.size());
    colval.reserve(B.val.size());
    {
      std::vector<double> acc(m, 0.0);
      std::vector<int> seen;
      seen.reserve(64);
      for (int j = 0; j < m; ++j) {
        for (int p = B.ptr[j]; p < B.ptr[j + 1]; ++p) {
          const int i = B.ind[p];
          if (acc[i] == 0.0) seen.push_back(i);
          acc[i] += B.val[p];
        }
        for (const int i : seen) {
          if (acc[i] != 0.0) {
            colind.push_back(i);
            colval.push_back(acc[i]);
            acc[i] = 0.0;
          }
        }
        seen.clear();
        colptr[j + 1] = static_cast<int>(colind.size());
      }
    }
    const int nnz = static_cast<int>(colind.size());

    // counts + row-wise view of the same entries
    std::vector<int> rowcnt(m_, 0), colcnt(m_, 0);
    for (int j = 0; j < m_; ++j) colcnt[j] = colptr[j + 1] - colptr[j];
    for (int p = 0; p < nnz; ++p) rowcnt[colind[p]]++;
    std::vector<int> rptr(m_ + 1, 0), rcol(nnz);
    std::vector<double> rval(nnz);
    for (int i = 0; i < m_; ++i) rptr[i + 1] = rptr[i] + rowcnt[i];
    {
      std::vector<int> w(rptr.begin(), rptr.end() - 1);
      for (int j = 0; j < m_; ++j)
        for (int p = colptr[j]; p < colptr[j + 1]; ++p) {
          const int i = colind[p];
          rcol[w[i]] = j;
          rval[w[i]] = colval[p];
          ++w[i];
        }
    }

    pivot_row_of_col_.assign(m_, -1);
    pivot_col_of_row_.assign(m_, -1);
    elim_pos_of_col_.assign(m_, -1);
    col_order_.clear();
    col_order_.reserve(m_);
    Lp_.assign(m_ + 1, 0);
    Up_.assign(m_ + 1, 0);
    Li_.clear(); Lx_.clear();
    Ui_.clear(); Ux_.clear();
    udiag_.assign(m_, 0.0);

    std::vector<uint8_t> row_done(m_, 0), col_done(m_, 0);

    // ---- singleton peeling ----
    std::vector<int> stack;
    for (int j = 0; j < m_; ++j)
      if (colcnt[j] == 1) stack.push_back(j);
    for (int i = 0; i < m_; ++i)
      if (rowcnt[i] == 1) stack.push_back(~i);

    auto emit_peeled = [&](int col, int prow, double piv) {
      const int k = static_cast<int>(col_order_.size());
      Lp_[k] = static_cast<int>(Li_.size());
      Up_[k] = static_cast<int>(Ui_.size());
      pivot_row_of_col_[col] = prow;
      pivot_col_of_row_[prow] = col;
      elim_pos_of_col_[col] = k;
      col_order_.push_back(col);
      udiag_[k] = piv;
      col_done[col] = 1;
      row_done[prow] = 1;
      for (int p = colptr[col]; p < colptr[col + 1]; ++p) {
        const int i = colind[p];
        if (i == prow) continue;
        if (row_done[i]) {
          Ui_.push_back(elim_pos_of_col_[pivot_col_of_row_[i]]);
          Ux_.push_back(colval[p]);
        } else {
          Li_.push_back(i);
          Lx_.push_back(colval[p] / piv);
        }
      }
      Lp_[k + 1] = static_cast<int>(Li_.size());
      Up_[k + 1] = static_cast<int>(Ui_.size());
      // update counts, enqueue new singletons
      for (int p = colptr[col]; p < colptr[col + 1]; ++p) {
        const int i = colind[p];
        if (row_done[i]) continue;
        if (--rowcnt[i] == 1) stack.push_back(~i);
      }
      for (int q = rptr[prow]; q < rptr[prow + 1]; ++q) {
        const int j2 = rcol[q];
        if (col_done[j2]) continue;
        if (--colcnt[j2] == 1) stack.push_back(j2);
      }
    };

    while (!stack.empty()) {
      const int item = stack.back();
      stack.pop_back();
      if (item >= 0) {  // column singleton: single un-done row
        const int j = item;
        if (col_done[j] || colcnt[j] != 1) continue;
        int prow = -1;
        double piv = 0.0, cmax = 0.0;
        for (int p = colptr[j]; p < colptr[j + 1]; ++p) {
          cmax = std::max(cmax, std::fabs(colval[p]));
          if (!row_done[colind[p]]) { prow = colind[p]; piv = colval[p]; }
        }
        // decline forced pivots that are tiny relative to their column:
        // the bump's partial pivoting will find a stabler row
        if (prow < 0 || std::fabs(piv) < kAbsPivTol ||
            std::fabs(piv) < 0.01 * cmax)
          continue;
        emit_peeled(j, prow, piv);
      } else {  // row singleton: single un-done column
        const int i = ~item;
        if (row_done[i] || rowcnt[i] != 1) continue;
        int col = -1;
        double piv = 0.0;
        for (int q = rptr[i]; q < rptr[i + 1]; ++q)
          if (!col_done[rcol[q]]) { col = rcol[q]; piv = rval[q]; }
        if (col < 0 || std::fabs(piv) < kAbsPivTol) continue;
        double cmax = 0.0;
        for (int p = colptr[col]; p < colptr[col + 1]; ++p)
          cmax = std::max(cmax, std::fabs(colval[p]));
        if (std::fabs(piv) < 0.01 * cmax) continue;
        emit_peeled(col, i, piv);
      }
    }

    // ---- bump: left-looking elimination, heap-ordered updates ----
    std::vector<int> bump_cols;
    for (int j = 0; j < m_; ++j)
      if (!col_done[j]) bump_cols.push_back(j);
    std::sort(bump_cols.begin(), bump_cols.end(), [&](int a, int b) {
      const int ca = colptr[a + 1] - colptr[a];
      const int cb = colptr[b + 1] - colptr[b];
      return ca < cb || (ca == cb && a < b);
    });

    std::vector<double> work(m_, 0.0);
    std::vector<uint8_t> mark(m_, 0);
    std::vector<int> pattern;
    pattern.reserve(64);
    std::vector<uint8_t> repair_used(m_, 0);
    std::priority_queue<int, std::vector<int>, std::greater<int>> heap;

    for (const int j : bump_cols) {
      const int k = static_cast<int>(col_order_.size());
      Lp_[k] = static_cast<int>(Li_.size());
      Up_[k] = static_cast<int>(Ui_.size());
      pattern.clear();
      for (int p = colptr[j]; p < colptr[j + 1]; ++p) {
        const int i = colind[p];
        work[i] = colval[p];
        mark[i] = 1;
        pattern.push_back(i);
        if (pivot_col_of_row_[i] >= 0)
          heap.push(elim_pos_of_col_[pivot_col_of_row_[i]]);
      }
      // unit-L forward substitution over pivoted positions present
      int last = -1;
      while (!heap.empty()) {
        const int kk = heap.top();
        heap.pop();
        if (kk == last) continue;  // duplicate
        last = kk;
        const int prow = pivot_row_of_col_[col_order_[kk]];
        const double z = work[prow];
        if (z == 0.0) continue;
        Ui_.push_back(kk);
        Ux_.push_back(z);
        work[prow] = 0.0;
        for (int p = Lp_[kk]; p < Lp_[kk + 1]; ++p) {
          const int i = Li_[p];
          if (!mark[i]) {
            mark[i] = 1;
            pattern.push_back(i);
            work[i] = 0.0;
            if (pivot_col_of_row_[i] >= 0) {
              const int pos = elim_pos_of_col_[pivot_col_of_row_[i]];
              if (pos > kk) heap.push(pos);
            }
          }
          work[i] -= Lx_[p] * z;
        }
      }
      // pivot: max |work| over un-pivoted rows. Reject pivots that are
      // tiny RELATIVE to the whole eliminated column too: accepting a
      // 1e-11-ish pivot under 1e0-scale eliminated mass emits 1e10+
      // L entries whose chains overflow x_B to inf on bases with many
      // forced free columns (50v-10-free-bound blew up this way).
      int prow = -1;
      double best = 0.0, colmax = 0.0;
      for (const int i : pattern) {
        const double a = std::fabs(work[i]);
        colmax = std::max(colmax, a);
        if (pivot_col_of_row_[i] >= 0) continue;
        if (a > best) { best = a; prow = i; }
      }
      if (prow < 0 || best < kAbsPivTol || best < kRelPivTol * colmax) {
        // dependent column: report for slack repair
        int freed = -1;
        for (int i = 0; i < m_; ++i)
          if (pivot_col_of_row_[i] < 0 && !repair_used[i] &&
              !mark_free_conflict(i)) { freed = i; break; }
        if (freed < 0) {
          for (int i = 0; i < m_; ++i)
            if (pivot_col_of_row_[i] < 0 && !repair_used[i]) {
              freed = i; break;
            }
        }
        repair_used[freed >= 0 ? freed : 0] = 1;
        replaced->push_back(jpos_lookup_ ? (*jpos_lookup_)[j] : j);
        replacement_row->push_back(freed);
        for (const int i : pattern) { mark[i] = 0; work[i] = 0.0; }
        // roll back U entries emitted for this column
        Ui_.resize(Up_[k]);
        Ux_.resize(Up_[k]);
        continue;  // factorization will be retried by the caller
      }
      pivot_row_of_col_[j] = prow;
      pivot_col_of_row_[prow] = j;
      elim_pos_of_col_[j] = k;
      col_order_.push_back(j);
      udiag_[k] = work[prow];
      for (const int i : pattern) {
        if (i != prow && work[i] != 0.0 && pivot_col_of_row_[i] < 0) {
          Li_.push_back(i);
          Lx_.push_back(work[i] / udiag_[k]);
        }
        mark[i] = 0;
        work[i] = 0.0;
      }
      Lp_[k + 1] = static_cast<int>(Li_.size());
      Up_[k + 1] = static_cast<int>(Ui_.size());
    }
    return replaced->empty();
  }

  // Solve B x = b, dense in place: factor solve then PFI etas.
  void Ftran(std::vector<double>& b) const {
    FactorFtran(b);
    for (const auto& e : etas_) {
      const double xr = b[e.r] / e.diag;
      if (xr != 0.0) {
        for (size_t t = 0; t < e.idx.size(); ++t)
          b[e.idx[t]] -= e.val[t] * xr;
      }
      b[e.r] = xr;
    }
  }

  // Solve B^T y = c, dense in place: etas in reverse, then factor.
  void Btran(std::vector<double>& c) const {
    for (auto it = etas_.rbegin(); it != etas_.rend(); ++it) {
      const auto& e = *it;
      double s = c[e.r];
      for (size_t t = 0; t < e.idx.size(); ++t)
        s -= e.val[t] * c[e.idx[t]];
      c[e.r] = s / e.diag;
    }
    FactorBtran(c);
  }

  // PFI update: basis position r takes a column whose FTRAN'd value is
  // `alpha` (= B^-1 a_q, dense). False if the pivot is too small —
  // absolutely, or relative to the column (eta application divides by
  // the pivot, amplifying every other entry by |a_i/a_r|).
  bool Update(int r, const std::vector<double>& alpha) {
    const double ar = alpha[r];
    if (std::fabs(ar) < kUpdatePivTol) return false;
    double amax = 0.0;
    for (int i = 0; i < m_; ++i)
      amax = std::max(amax, std::fabs(alpha[i]));
    if (std::fabs(ar) < 1e-4 * amax) return false;
    Eta e;
    e.r = r;
    e.diag = ar;
    for (int i = 0; i < m_; ++i) {
      if (i != r && alpha[i] != 0.0) {
        e.idx.push_back(i);
        e.val.push_back(alpha[i]);
      }
    }
    etas_.push_back(std::move(e));
    ++n_updates_;
    return true;
  }

  int n_updates() const { return n_updates_; }

 private:
  static constexpr double kAbsPivTol = 1e-11;
  static constexpr double kRelPivTol = 1e-9;
  // PFI etas divide by the pivot: a 1e-9 pivot amplifies O(1) rounding
  // into O(1e7) solution error, silently corrupting x_B between
  // refactorizations. Reject early and let the simplex refactorize.
  static constexpr double kUpdatePivTol = 1e-7;

  bool mark_free_conflict(int) const { return false; }

  // With L U = P B Q (unit L, diag of U in udiag_):
  //   FTRAN: L z = P b; U w = z; x = Q w.
  void FactorFtran(std::vector<double>& b) const {
    const int K = static_cast<int>(col_order_.size());
    scratch_.assign(m_, 0.0);
    for (int k = 0; k < K; ++k) {
      const double zk = b[pivot_row_of_col_[col_order_[k]]];
      scratch_[k] = zk;
      if (zk != 0.0) {
        for (int p = Lp_[k]; p < Lp_[k + 1]; ++p)
          b[Li_[p]] -= Lx_[p] * zk;
      }
    }
    for (int k = K - 1; k >= 0; --k) {
      const double xk = scratch_[k] / udiag_[k];
      scratch_[k] = xk;
      if (xk != 0.0) {
        for (int p = Up_[k]; p < Up_[k + 1]; ++p)
          scratch_[Ui_[p]] -= Ux_[p] * xk;
      }
    }
    std::fill(b.begin(), b.end(), 0.0);
    for (int k = 0; k < K; ++k) b[col_order_[k]] = scratch_[k];
  }

  //   BTRAN: U^T t = Q^T c; L^T (P y) = t.
  void FactorBtran(std::vector<double>& c) const {
    const int K = static_cast<int>(col_order_.size());
    scratch_.assign(m_, 0.0);
    for (int k = 0; k < K; ++k) scratch_[k] = c[col_order_[k]];
    for (int k = 0; k < K; ++k) {
      double s = scratch_[k];
      for (int p = Up_[k]; p < Up_[k + 1]; ++p)
        s -= Ux_[p] * scratch_[Ui_[p]];
      scratch_[k] = s / udiag_[k];
    }
    std::fill(c.begin(), c.end(), 0.0);
    for (int k = K - 1; k >= 0; --k) {
      double s = scratch_[k];
      for (int p = Lp_[k]; p < Lp_[k + 1]; ++p)
        s -= Lx_[p] * c[Li_[p]];
      c[pivot_row_of_col_[col_order_[k]]] = s;
    }
  }

  int m_ = 0;
  std::vector<int> Lp_, Li_, Up_, Ui_;
  std::vector<double> Lx_, Ux_, udiag_;
  std::vector<int> col_order_;         // elimination order of basis cols
  std::vector<int> pivot_row_of_col_;  // basis col position -> pivot row
  std::vector<int> pivot_col_of_row_;
  std::vector<int> elim_pos_of_col_;
  const std::vector<int>* jpos_lookup_ = nullptr;  // unused hook
  struct Eta {
    int r;
    double diag;
    std::vector<int> idx;
    std::vector<double> val;
  };
  std::vector<Eta> etas_;
  int n_updates_ = 0;
  mutable std::vector<double> scratch_;
};

}  // namespace tpu_simplex
