// MILU — multilevel recursive incomplete LU preconditioner (native).
//
// The TPU framework's analog of the reference's MRILU library
// (reference mrilu/precon/cmpprc.F90, bepnum.F90 — Wubs et al.'s
// Multilevel Recursive Incomplete LU) and its Ifpack bridge
// (reference src/mrilucpp/mrilucpp.F90:120-265 handle-based
// create/factor/apply API).  Host-side C++: the factorization is
// sequential-sparse work that XLA cannot express; the apply is cheap
// and is used (a) as a CPU preconditioner backend for verification
// runs and (b) for preconditioning small subsystems (e.g. the
// depth-averaged saddle point) where a few-thousand-dof sparse solve
// beats a Krylov sweep.
//
// Algorithm (the MRILU recipe, re-implemented from the published
// method, not translated from the Fortran):
//   level k: pick a maximal independent set F of rows that are
//     strongly diagonally dominant (|a_ii| >= dom * sum_j |a_ij|).
//     Independence makes A_FF diagonal, so the elimination
//       S = A_CC - A_CF inv(A_FF) A_FC
//     is one sparse outer-product sweep; entries with
//     |s_ij| < droptol * ||row|| are dropped (lumped onto the
//     diagonal to preserve row sums, MRILU's "lumping" strategy).
//   recurse on S until it stops shrinking or is small, then factor
//   the final block with dense partial-pivot LU.
//
// C API (handle-based like mrilucpp):
//   milu_factor(n, indptr, indices, data, droptol, dom, max_levels,
//               min_coarse) -> handle (int64, 0 on failure)
//   milu_solve(handle, b, x)        — x = M^{-1} b
//   milu_levels(handle)             — number of levels built
//   milu_destroy(handle)
//
// Build: g++ -O3 -shared -fPIC -o libmilu.so milu.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <map>
#include <memory>
#include <mutex>
#include <vector>

namespace {

struct CSR {
  int n = 0;
  std::vector<int64_t> indptr;
  std::vector<int32_t> indices;
  std::vector<double> data;
};

struct Level {
  // partition: fine set F (eliminated) and coarse set C (recursed)
  std::vector<int32_t> fine;        // global-in-level row ids of F
  std::vector<int32_t> perm;        // level ordering [F | C]
  std::vector<int32_t> where;       // row -> position (F: 0..nf-1, C: nf..)
  std::vector<double> dinv;         // inv(A_FF) diagonal, size nf
  CSR Acf;                          // A_CF  (nc x nf)
  CSR Afc;                          // A_FC  (nf x nc)
  int nf = 0, nc = 0;
};

struct Factor {
  std::vector<Level> levels;
  // dense LU of the last Schur complement
  int nlast = 0;
  std::vector<double> lu;           // row-major n x n
  std::vector<int32_t> piv;
  // optional Cuthill-McKee pre-ordering (MRILU's preprocessing stage,
  // reference mrilu/precon: CMK/block orderings before elimination).
  // cmk[i] = original row id at permuted position i; empty when off.
  std::vector<int32_t> cmk;
};

// ---- Cuthill-McKee ordering -------------------------------------------
// BFS from a minimum-degree seed, visiting neighbors in increasing
// degree order; repeated per connected component.  Improves the
// locality of the independent fine sets and reduces Schur fill, the
// role of MRILU's CMK preprocessing.
std::vector<int32_t> cmk_order(const CSR& A) {
  const int n = A.n;
  std::vector<int32_t> deg(n);
  for (int i = 0; i < n; ++i)
    deg[i] = (int32_t)(A.indptr[i + 1] - A.indptr[i]);
  std::vector<int32_t> order;
  order.reserve(n);
  std::vector<char> seen(n, 0);
  std::vector<int32_t> queue;
  for (;;) {
    // seed: unvisited vertex of minimum degree
    int seed = -1;
    for (int i = 0; i < n; ++i)
      if (!seen[i] && (seed < 0 || deg[i] < deg[seed])) seed = i;
    if (seed < 0) break;
    queue.clear();
    queue.push_back(seed);
    seen[seed] = 1;
    for (size_t qh = 0; qh < queue.size(); ++qh) {
      int u = queue[qh];
      order.push_back(u);
      // collect unvisited neighbors, sorted by degree
      std::vector<int32_t> nb;
      for (int64_t p = A.indptr[u]; p < A.indptr[u + 1]; ++p) {
        int v = A.indices[p];
        if (v >= 0 && v < n && !seen[v]) { seen[v] = 1; nb.push_back(v); }
      }
      std::sort(nb.begin(), nb.end(),
                [&](int a, int b) { return deg[a] < deg[b]; });
      for (int v : nb) queue.push_back(v);
    }
  }
  return order;
}

// symmetric permutation B = P A P^T with perm[i] = old id at new pos i
CSR permute_sym(const CSR& A, const std::vector<int32_t>& perm) {
  const int n = A.n;
  std::vector<int32_t> inv(n);
  for (int i = 0; i < n; ++i) inv[perm[i]] = i;
  CSR B;
  B.n = n;
  B.indptr.assign(n + 1, 0);
  for (int i = 0; i < n; ++i)
    B.indptr[i + 1] = B.indptr[i]
        + (A.indptr[perm[i] + 1] - A.indptr[perm[i]]);
  B.indices.resize(B.indptr[n]);
  B.data.resize(B.indptr[n]);
  for (int i = 0; i < n; ++i) {
    int old = perm[i];
    int64_t q = B.indptr[i];
    for (int64_t p = A.indptr[old]; p < A.indptr[old + 1]; ++p, ++q) {
      B.indices[q] = inv[A.indices[p]];
      B.data[q] = A.data[p];
    }
  }
  return B;
}

std::mutex g_mutex;
std::map<int64_t, std::unique_ptr<Factor>> g_handles;
int64_t g_next = 1;

// ---- dense partial-pivot LU -------------------------------------------
// Singular pivots (the matrix's pressure null modes reach the coarse
// bottom) are replaced by +scale, NOT by a tiny epsilon: a tiny pivot
// would put O(1/eps) null-space junk into every preconditioner apply
// and stall the outer Krylov; a unit-scale pivot makes M^{-1} act
// like the identity on the null directions (the same reasoning as the
// reference's dummy-row fixes, TRIOS_Saddlepoint.H:259-276).
bool dense_lu(std::vector<double>& a, std::vector<int32_t>& piv, int n,
              double scale) {
  piv.resize(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  if (scale <= 0.0) scale = 1.0;
  for (int k = 0; k < n; ++k) {
    int p = k;
    double mx = std::fabs(a[(size_t)k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(a[(size_t)i * n + k]);
      if (v > mx) { mx = v; p = i; }
    }
    if (mx < 1e-10 * scale) {     // singular pivot: unit-scale fix
      a[(size_t)p * n + k] += (a[(size_t)p * n + k] >= 0.0 ? scale
                                                           : -scale);
      mx = std::fabs(a[(size_t)p * n + k]);
    }
    if (p != k) {
      for (int j = 0; j < n; ++j)
        std::swap(a[(size_t)k * n + j], a[(size_t)p * n + j]);
      std::swap(piv[k], piv[p]);
    }
    double pivval = a[(size_t)k * n + k];
    for (int i = k + 1; i < n; ++i) {
      double m = a[(size_t)i * n + k] / pivval;
      a[(size_t)i * n + k] = m;
      if (m != 0.0)
        for (int j = k + 1; j < n; ++j)
          a[(size_t)i * n + j] -= m * a[(size_t)k * n + j];
    }
  }
  return true;
}

void dense_lu_solve(const std::vector<double>& a,
                    const std::vector<int32_t>& piv, int n,
                    const double* b, double* x) {
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) y[i] = b[piv[i]];
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < i; ++j) y[i] -= a[(size_t)i * n + j] * y[j];
  for (int i = n - 1; i >= 0; --i) {
    for (int j = i + 1; j < n; ++j) y[i] -= a[(size_t)i * n + j] * y[j];
    y[i] /= a[(size_t)i * n + i];
  }
  std::memcpy(x, y.data(), sizeof(double) * n);
}

// ---- one MILU level ----------------------------------------------------
// Returns the Schur complement on the coarse set; fills lvl.
CSR eliminate_level(const CSR& A, double droptol, double dom, Level& lvl) {
  const int n = A.n;
  // greedy maximal independent set of diagonally-dominant rows
  std::vector<char> state(n, 0);   // 0 undecided, 1 fine, 2 coarse
  std::vector<double> diag(n, 0.0), offsum(n, 0.0);
  for (int i = 0; i < n; ++i) {
    for (int64_t p = A.indptr[i]; p < A.indptr[i + 1]; ++p) {
      if (A.indices[p] == i) diag[i] += A.data[p];
      else offsum[i] += std::fabs(A.data[p]);
    }
  }
  // absolute pivot floor: near-zero "dummy" diagonals (singular
  // pressure rows, land stubs — the reference's dummy-row detection,
  // TRIOS_BlockPreconditioner.C:478-487) must never be eliminated;
  // they go to the coarse set and meet the pivoted dense bottom.
  double gmax = 0.0;
  for (double v : A.data) gmax = std::max(gmax, std::fabs(v));
  const double pivfloor = 1e-8 * gmax;
  for (int i = 0; i < n; ++i) {
    if (state[i]) continue;
    if (std::fabs(diag[i]) >= dom * offsum[i]
        && std::fabs(diag[i]) >= pivfloor) {
      state[i] = 1;                          // fine
      for (int64_t p = A.indptr[i]; p < A.indptr[i + 1]; ++p) {
        int j = A.indices[p];
        if (j != i && !state[j]) state[j] = 2;   // neighbors -> coarse
      }
    }
  }
  // symmetric neighbor check: a fine row whose neighbor is also fine
  // would break the diagonal-A_FF property via its column entries.
  // Column neighbors were already excluded by the row sweep only for
  // the row pattern; enforce with the transpose pattern:
  {
    std::vector<std::vector<int32_t>> colnbr(n);
    for (int i = 0; i < n; ++i)
      for (int64_t p = A.indptr[i]; p < A.indptr[i + 1]; ++p)
        if (A.indices[p] != i) colnbr[A.indices[p]].push_back(i);
    for (int i = 0; i < n; ++i) {
      if (state[i] != 1) continue;
      for (int32_t j : colnbr[i]) {
        if (j != i && state[j] == 1) { state[j] = 2; }
      }
    }
  }
  lvl.fine.clear();
  std::vector<int32_t> coarse;
  for (int i = 0; i < n; ++i) {
    if (state[i] == 1) lvl.fine.push_back(i);
    else coarse.push_back(i);
  }
  lvl.nf = (int)lvl.fine.size();
  lvl.nc = (int)coarse.size();
  lvl.where.assign(n, -1);
  lvl.perm.resize(n);
  for (int k = 0; k < lvl.nf; ++k) {
    lvl.where[lvl.fine[k]] = k;
    lvl.perm[k] = lvl.fine[k];
  }
  for (int k = 0; k < lvl.nc; ++k) {
    lvl.where[coarse[k]] = lvl.nf + k;
    lvl.perm[lvl.nf + k] = coarse[k];
  }

  // inv(A_FF) diagonal
  lvl.dinv.resize(lvl.nf);
  for (int k = 0; k < lvl.nf; ++k) lvl.dinv[k] = 1.0 / diag[lvl.fine[k]];

  // split blocks: A_FC (nf x nc), A_CF (nc x nf), A_CC (nc x nc)
  CSR Afc, Acf, Acc;
  Afc.n = lvl.nf; Acf.n = lvl.nc; Acc.n = lvl.nc;
  Afc.indptr.assign(lvl.nf + 1, 0);
  Acf.indptr.assign(lvl.nc + 1, 0);
  Acc.indptr.assign(lvl.nc + 1, 0);
  for (int i = 0; i < n; ++i) {
    int w = lvl.where[i];
    bool isF = w < lvl.nf;
    for (int64_t p = A.indptr[i]; p < A.indptr[i + 1]; ++p) {
      int j = A.indices[p];
      int wj = lvl.where[j];
      bool jF = wj < lvl.nf;
      if (isF && !jF) Afc.indptr[w + 1]++;
      else if (!isF && jF) Acf.indptr[w - lvl.nf + 1]++;
      else if (!isF && !jF) Acc.indptr[w - lvl.nf + 1]++;
    }
  }
  for (int i = 0; i < lvl.nf; ++i) Afc.indptr[i + 1] += Afc.indptr[i];
  for (int i = 0; i < lvl.nc; ++i) {
    Acf.indptr[i + 1] += Acf.indptr[i];
    Acc.indptr[i + 1] += Acc.indptr[i];
  }
  Afc.indices.resize(Afc.indptr[lvl.nf]);
  Afc.data.resize(Afc.indptr[lvl.nf]);
  Acf.indices.resize(Acf.indptr[lvl.nc]);
  Acf.data.resize(Acf.indptr[lvl.nc]);
  Acc.indices.resize(Acc.indptr[lvl.nc]);
  Acc.data.resize(Acc.indptr[lvl.nc]);
  {
    std::vector<int64_t> wf(Afc.indptr.begin(), Afc.indptr.end() - 1);
    std::vector<int64_t> wc(Acf.indptr.begin(), Acf.indptr.end() - 1);
    std::vector<int64_t> ww(Acc.indptr.begin(), Acc.indptr.end() - 1);
    for (int i = 0; i < n; ++i) {
      int w = lvl.where[i];
      bool isF = w < lvl.nf;
      for (int64_t p = A.indptr[i]; p < A.indptr[i + 1]; ++p) {
        int j = A.indices[p];
        int wj = lvl.where[j];
        bool jF = wj < lvl.nf;
        if (isF && !jF) {
          Afc.indices[wf[w]] = wj - lvl.nf;
          Afc.data[wf[w]++] = A.data[p];
        } else if (!isF && jF) {
          Acf.indices[wc[w - lvl.nf]] = wj;
          Acf.data[wc[w - lvl.nf]++] = A.data[p];
        } else if (!isF && !jF) {
          Acc.indices[ww[w - lvl.nf]] = wj - lvl.nf;
          Acc.data[ww[w - lvl.nf]++] = A.data[p];
        }
      }
    }
  }

  // Schur complement S = Acc - Acf dinv Afc with drop + diagonal lumping
  CSR S;
  S.n = lvl.nc;
  S.indptr.assign(lvl.nc + 1, 0);
  std::vector<double> work(lvl.nc, 0.0);
  std::vector<int32_t> touched;
  std::vector<int64_t> rowptr; rowptr.reserve(lvl.nc + 1);
  std::vector<int32_t> out_idx;
  std::vector<double> out_val;
  rowptr.push_back(0);
  for (int r = 0; r < lvl.nc; ++r) {
    touched.clear();
    double rownorm = 0.0;
    for (int64_t p = Acc.indptr[r]; p < Acc.indptr[r + 1]; ++p) {
      int j = Acc.indices[p];
      if (work[j] == 0.0 && Acc.data[p] != 0.0) touched.push_back(j);
      work[j] += Acc.data[p];
      rownorm += std::fabs(Acc.data[p]);
    }
    for (int64_t p = Acf.indptr[r]; p < Acf.indptr[r + 1]; ++p) {
      int f = Acf.indices[p];
      double alpha = Acf.data[p] * lvl.dinv[f];
      for (int64_t q = Afc.indptr[f]; q < Afc.indptr[f + 1]; ++q) {
        int j = Afc.indices[q];
        double v = -alpha * Afc.data[q];
        if (work[j] == 0.0 && v != 0.0) touched.push_back(j);
        work[j] += v;
        rownorm += std::fabs(v);
      }
    }
    // drop small entries, lump them onto the diagonal (row-sum
    // preservation, the MRILU lumping strategy)
    double thresh = droptol * rownorm;
    double lump = 0.0;
    for (int32_t j : touched) {
      if (j != r && std::fabs(work[j]) < thresh) {
        lump += work[j];
        work[j] = 0.0;
      }
    }
    work[r] += lump;
    bool hasdiag = false;
    for (int32_t j : touched) {
      if (work[j] != 0.0 || j == r) {
        out_idx.push_back(j);
        out_val.push_back(work[j]);
        if (j == r) hasdiag = true;
      }
      work[j] = 0.0;
    }
    if (!hasdiag) { out_idx.push_back(r); out_val.push_back(0.0); }
    rowptr.push_back((int64_t)out_idx.size());
  }
  S.indptr = std::move(rowptr);
  S.indices = std::move(out_idx);
  S.data = std::move(out_val);
  lvl.Acf = std::move(Acf);
  lvl.Afc = std::move(Afc);
  return S;
}

void level_forward(const Level& lvl, const double* b, double* bf,
                   double* bc) {
  // bf = b_F ; bc = b_C - A_CF inv(A_FF) b_F
  for (int k = 0; k < lvl.nf; ++k) bf[k] = b[lvl.perm[k]];
  for (int k = 0; k < lvl.nc; ++k) bc[k] = b[lvl.perm[lvl.nf + k]];
  for (int r = 0; r < lvl.nc; ++r) {
    double acc = 0.0;
    for (int64_t p = lvl.Acf.indptr[r]; p < lvl.Acf.indptr[r + 1]; ++p) {
      int f = lvl.Acf.indices[p];
      acc += lvl.Acf.data[p] * lvl.dinv[f] * bf[f];
    }
    bc[r] -= acc;
  }
}

void level_backward(const Level& lvl, const double* bf, const double* xc,
                    double* x) {
  // x_F = inv(A_FF) (b_F - A_FC x_C); scatter [x_F | x_C] -> x
  for (int k = 0; k < lvl.nf; ++k) {
    double acc = bf[k];
    for (int64_t p = lvl.Afc.indptr[k]; p < lvl.Afc.indptr[k + 1]; ++p)
      acc -= lvl.Afc.data[p] * xc[lvl.Afc.indices[p]];
    x[lvl.perm[k]] = lvl.dinv[k] * acc;
  }
  for (int k = 0; k < lvl.nc; ++k) x[lvl.perm[lvl.nf + k]] = xc[k];
}

}  // namespace

extern "C" {

int64_t milu_factor(int32_t n, const int64_t* indptr,
                    const int32_t* indices, const double* data,
                    double droptol, double dom, int32_t max_levels,
                    int32_t min_coarse, int32_t use_cmk) {
  auto fac = std::make_unique<Factor>();
  CSR A;
  A.n = n;
  A.indptr.assign(indptr, indptr + n + 1);
  A.indices.assign(indices, indices + indptr[n]);
  A.data.assign(data, data + indptr[n]);
  if (use_cmk) {
    fac->cmk = cmk_order(A);
    A = permute_sym(A, fac->cmk);
  }

  for (int levi = 0; levi < max_levels && A.n > min_coarse; ++levi) {
    Level lvl;
    CSR S = eliminate_level(A, droptol, dom, lvl);
    if (lvl.nf == 0) break;             // no dominant rows: stop
    fac->levels.push_back(std::move(lvl));
    A = std::move(S);
  }
  // dense factor of the final block
  fac->nlast = A.n;
  fac->lu.assign((size_t)A.n * A.n, 0.0);
  for (int i = 0; i < A.n; ++i)
    for (int64_t p = A.indptr[i]; p < A.indptr[i + 1]; ++p)
      fac->lu[(size_t)i * A.n + A.indices[p]] += A.data[p];
  double lscale = 0.0;
  for (double v : fac->lu) lscale = std::max(lscale, std::fabs(v));
  if (!dense_lu(fac->lu, fac->piv, A.n, lscale)) return 0;

  std::lock_guard<std::mutex> lock(g_mutex);
  int64_t h = g_next++;
  g_handles[h] = std::move(fac);
  return h;
}

int32_t milu_levels(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_handles.find(handle);
  if (it == g_handles.end()) return -1;
  return (int32_t)it->second->levels.size();
}

int32_t milu_solve(int64_t handle, const double* b, double* x,
                   int32_t n) {
  Factor* fac;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_handles.find(handle);
    if (it == g_handles.end()) return 1;
    fac = it->second.get();
  }
  // forward sweep down the levels (after the CMK pre-permutation)
  std::vector<std::vector<double>> bfs;
  std::vector<double> cur(b, b + n);
  if (!fac->cmk.empty())
    for (int i = 0; i < n; ++i) cur[i] = b[fac->cmk[i]];
  for (const Level& lvl : fac->levels) {
    std::vector<double> bf(lvl.nf), bc(lvl.nc);
    level_forward(lvl, cur.data(), bf.data(), bc.data());
    bfs.push_back(std::move(bf));
    cur = std::move(bc);
  }
  // dense solve at the bottom
  std::vector<double> xc(fac->nlast);
  if (fac->nlast > 0)
    dense_lu_solve(fac->lu, fac->piv, fac->nlast, cur.data(), xc.data());
  // backward sweep up the levels
  for (int li = (int)fac->levels.size() - 1; li >= 0; --li) {
    const Level& lvl = fac->levels[li];
    std::vector<double> xl((size_t)lvl.nf + lvl.nc);
    level_backward(lvl, bfs[li].data(), xc.data(), xl.data());
    xc = std::move(xl);
  }
  if (!fac->cmk.empty())
    for (int i = 0; i < n; ++i) x[fac->cmk[i]] = xc[i];
  else
    std::memcpy(x, xc.data(), sizeof(double) * n);
  return 0;
}

// ---- native Krylov driver ---------------------------------------------
// Right-preconditioned restarted GMRES on a caller-provided CSR
// operator with this factorization as M^{-1} — the analog of MRILU's
// own solver drivers that ship with the preconditioner (reference
// mrilu/precon/gmres.F90, bicgstab.F90 and the convprogs/ test
// drivers).  Returns iterations used, or -1 on error; relres out.
int32_t milu_gmres(int64_t handle, int32_t n, const int64_t* indptr,
                   const int32_t* indices, const double* data,
                   const double* b, double* x, double tol,
                   int32_t maxiter, int32_t restart, double* relres) {
  Factor* fac;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_handles.find(handle);
    if (it == g_handles.end()) return -1;
    fac = it->second.get();
  }
  auto matvec = [&](const double* v, double* y) {
    for (int i = 0; i < n; ++i) {
      double s = 0.0;
      for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
        s += data[p] * v[indices[p]];
      y[i] = s;
    }
  };
  auto nrm2 = [&](const double* v) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += v[i] * v[i];
    return std::sqrt(s);
  };
  if (restart <= 0) restart = 30;
  std::vector<double> x0(x, x + n), r(n), w(n), z(n);
  double bn = nrm2(b);
  if (bn == 0.0) { std::memset(x, 0, sizeof(double) * n); *relres = 0.0; return 0; }
  int total = 0;
  double beta = 0.0;
  for (;;) {
    matvec(x0.data(), r.data());
    for (int i = 0; i < n; ++i) r[i] = b[i] - r[i];
    beta = nrm2(r.data());
    *relres = beta / bn;
    if (*relres <= tol || total >= maxiter) break;
    int m = std::min<int32_t>(restart, maxiter - total);
    std::vector<std::vector<double>> V(m + 1, std::vector<double>(n));
    std::vector<std::vector<double>> Z(m, std::vector<double>(n));
    std::vector<double> H((size_t)(m + 1) * m, 0.0);
    std::vector<double> cs(m), sn(m), g(m + 1, 0.0);
    for (int i = 0; i < n; ++i) V[0][i] = r[i] / beta;
    g[0] = beta;
    int k = 0;
    for (; k < m; ++k) {
      milu_solve(handle, V[k].data(), Z[k].data(), n);
      matvec(Z[k].data(), w.data());
      for (int j = 0; j <= k; ++j) {
        double h = 0.0;
        for (int i = 0; i < n; ++i) h += w[i] * V[j][i];
        H[(size_t)j * m + k] = h;
        for (int i = 0; i < n; ++i) w[i] -= h * V[j][i];
      }
      double h1 = nrm2(w.data());
      ++total;
      // apply stored Givens rotations
      for (int j = 0; j < k; ++j) {
        double t = cs[j] * H[(size_t)j * m + k]
                 + sn[j] * H[(size_t)(j + 1) * m + k];
        H[(size_t)(j + 1) * m + k] = -sn[j] * H[(size_t)j * m + k]
                                   + cs[j] * H[(size_t)(j + 1) * m + k];
        H[(size_t)j * m + k] = t;
      }
      double hk = H[(size_t)k * m + k];
      double d = std::sqrt(hk * hk + h1 * h1);
      if (d == 0.0) d = 1e-300;
      cs[k] = hk / d;
      sn[k] = h1 / d;
      H[(size_t)k * m + k] = d;
      g[k + 1] = -sn[k] * g[k];
      g[k] = cs[k] * g[k];
      if (h1 != 0.0)
        for (int i = 0; i < n; ++i) V[k + 1][i] = w[i] / h1;
      if (std::fabs(g[k + 1]) / bn <= tol || h1 == 0.0) { ++k; break; }
    }
    // back substitution
    std::vector<double> y(k, 0.0);
    for (int i = k - 1; i >= 0; --i) {
      double s = g[i];
      for (int j = i + 1; j < k; ++j) s -= H[(size_t)i * m + j] * y[j];
      y[i] = s / H[(size_t)i * m + i];
    }
    for (int j = 0; j < k; ++j)
      for (int i = 0; i < n; ++i) x0[i] += y[j] * Z[j][i];
    if (total >= maxiter) {
      matvec(x0.data(), r.data());
      for (int i = 0; i < n; ++i) r[i] = b[i] - r[i];
      *relres = nrm2(r.data()) / bn;
      break;
    }
  }
  std::memcpy(x, x0.data(), sizeof(double) * n);
  return total;
}

void milu_destroy(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  g_handles.erase(handle);
}

}  // extern "C"
