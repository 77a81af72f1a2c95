// Native plan-time kernels for petsctpu.
//
// The reference implements its entire runtime in C; in this framework the
// DEVICE path is XLA/Pallas, but the host-side plan/setup work — numeric
// ILU(0) factorization, triangular-solve level scheduling, Jacobian
// coloring, AMG aggregation, RCM ordering — is O(nnz) pointer-chasing that
// Python cannot do at production scale. These are the petsctpu equivalents
// of (reference): MatLUFactorNumeric_SeqAIJ (src/mat/impls/aij/seq/
// aijfact.c:461), MatGetOrdering RCM (src/mat/order/genrcm.c), MatColoring
// (src/mat/color), MatCoarsen MIS (src/mat/coarsen/mis.c).
//
// Build: scripts/build_native.sh  (g++ -O3 -shared -fPIC)
// ABI: plain C functions over CSR arrays (int64 indptr, int32 indices).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <queue>

extern "C" {

// ILU(0): in-place numeric factorization restricted to the pattern.
// CSR must have sorted column indices and an explicit diagonal.
// Returns 0 on success, -(i+1) if row i has no diagonal, (i+1) on zero pivot.
int64_t ilu0_csr(int64_t n, const int64_t* indptr, const int32_t* indices,
                 double* data) {
    std::vector<int64_t> diag(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t d = -1;
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
            if (indices[p] == i) { d = p; break; }
        if (d < 0) return -(i + 1);
        diag[i] = d;
    }
    // work[j] = position of column j in the current row (or -1)
    std::vector<int64_t> work(n, -1);
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
            work[indices[p]] = p;
        for (int64_t p = indptr[i]; p < diag[i]; ++p) {
            int64_t k = indices[p];
            double ukk = data[diag[k]];
            if (ukk == 0.0) return k + 1;
            double lik = data[p] / ukk;
            data[p] = lik;
            for (int64_t q = diag[k] + 1; q < indptr[k + 1]; ++q) {
                int64_t pos = work[indices[q]];
                if (pos >= 0) data[pos] -= lik * data[q];
            }
        }
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
            work[indices[p]] = -1;
    }
    return 0;
}

// Dependency level of each row for a triangular solve (wavefronts).
int64_t tri_levels(int64_t n, const int64_t* indptr, const int32_t* indices,
                   int32_t lower, int64_t* level) {
    int64_t maxlev = 0;
    if (lower) {
        for (int64_t i = 0; i < n; ++i) {
            int64_t lv = 0;
            for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
                int32_t j = indices[p];
                if (j < i && level[j] + 1 > lv) lv = level[j] + 1;
            }
            level[i] = lv;
            if (lv > maxlev) maxlev = lv;
        }
    } else {
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t lv = 0;
            for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
                int32_t j = indices[p];
                if (j > i && level[j] + 1 > lv) lv = level[j] + 1;
            }
            level[i] = lv;
            if (lv > maxlev) maxlev = lv;
        }
    }
    return maxlev + 1;
}

// Greedy distance-2 column coloring for FD Jacobians.
// Needs the pattern in CSR (row_ptr/row_idx) AND CSC (col_ptr/col_idx).
// Returns the number of colors.
int64_t greedy_color(int64_t n_rows, int64_t n_cols,
                     const int64_t* row_ptr, const int32_t* row_idx,
                     const int64_t* col_ptr, const int32_t* col_idx,
                     int32_t* color) {
    std::vector<int32_t> mark(n_cols + 1, -1);
    int64_t ncolors = 0;
    for (int64_t j = 0; j < n_cols; ++j) color[j] = -1;
    for (int64_t j = 0; j < n_cols; ++j) {
        // forbid colors of all columns sharing a row with column j
        for (int64_t p = col_ptr[j]; p < col_ptr[j + 1]; ++p) {
            int32_t r = col_idx[p];
            for (int64_t q = row_ptr[r]; q < row_ptr[r + 1]; ++q) {
                int32_t c2 = row_idx[q];
                if (color[c2] >= 0) mark[color[c2]] = (int32_t)j;
            }
        }
        int32_t c = 0;
        while (c <= n_cols && mark[c] == (int32_t)j) ++c;
        color[j] = c;
        if (c + 1 > ncolors) ncolors = c + 1;
    }
    return ncolors;
}

// Greedy root-based aggregation for smoothed-aggregation AMG.
// S: symmetrized strength graph (CSR). Returns number of aggregates.
int64_t aggregate(int64_t n, const int64_t* indptr, const int32_t* indices,
                  int64_t* agg) {
    for (int64_t i = 0; i < n; ++i) agg[i] = -1;
    int64_t na = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        bool free_nbhd = true;
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
            if (agg[indices[p]] != -1) { free_nbhd = false; break; }
        if (free_nbhd) {
            agg[i] = na;
            for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
                agg[indices[p]] = na;
            ++na;
        }
    }
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            if (agg[indices[p]] != -1) { agg[i] = agg[indices[p]]; break; }
        }
    }
    for (int64_t i = 0; i < n; ++i)
        if (agg[i] == -1) agg[i] = na++;
    return na;
}

// Reverse Cuthill-McKee ordering (genrcm.c equivalent): BFS from a
// pseudo-peripheral vertex of each component, neighbors by increasing
// degree, then reverse. perm[k] = old index of new row k.
int64_t rcm(int64_t n, const int64_t* indptr, const int32_t* indices,
            int32_t* perm) {
    std::vector<int64_t> degree(n);
    for (int64_t i = 0; i < n; ++i) degree[i] = indptr[i + 1] - indptr[i];
    std::vector<char> visited(n, 0);
    std::vector<int32_t> order;
    order.reserve(n);
    std::vector<int32_t> nbrs;
    for (int64_t start = 0; start < n; ++start) {
        if (visited[start]) continue;
        // pseudo-peripheral: min-degree unvisited in this sweep
        int64_t root = start;
        for (int64_t i = start; i < n; ++i)
            if (!visited[i] && degree[i] < degree[root]) root = i;
        std::queue<int32_t> q;
        q.push((int32_t)root);
        visited[root] = 1;
        while (!q.empty()) {
            int32_t u = q.front(); q.pop();
            order.push_back(u);
            nbrs.clear();
            for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
                int32_t v = indices[p];
                if (!visited[v]) { visited[v] = 1; nbrs.push_back(v); }
            }
            std::sort(nbrs.begin(), nbrs.end(),
                      [&](int32_t a, int32_t b) {
                          return degree[a] < degree[b];
                      });
            for (int32_t v : nbrs) q.push(v);
        }
    }
    for (int64_t k = 0; k < n; ++k) perm[k] = order[n - 1 - k];
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Symbolic factorizations + ICC numeric (round 2): the remaining plan-time
// Python row loops, ported 1:1 so results are bit-identical to the pure-
// Python implementations in petsctpu/pc/factor.py and petsctpu/mat/factor.py.
// Reference algorithms: MatILUFactorSymbolic level rule (src/mat/impls/aij/
// seq/aijfact.c:122), MatICCFactorSymbolic_SeqAIJ (aijfact.c:2405),
// MatCholeskyFactorNumeric_SeqAIJ (aijfact.c:2076) + MatPivotCheck
// (include/petsc-private/matimpl.h:511-585).
// ---------------------------------------------------------------------------

#include <map>

extern "C" {

void native_free(void* p) { free(p); }

// Symbolic ILU(k), Saad level rule. Returns total nnz of the pattern;
// *out_indptr (n+1) and *out_cols (nnz) are malloc'd (caller frees via
// native_free).
int64_t iluk_pattern(int64_t n, const int64_t* indptr, const int32_t* indices,
                     int64_t k, int64_t** out_indptr, int64_t** out_cols) {
    std::vector<std::vector<std::pair<int64_t, int32_t>>> rowpat(n);
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        std::map<int64_t, int32_t> lev;
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
            lev[indices[p]] = 0;
        // process columns < i in ascending order; fills land strictly
        // to the right of the current pivot so map iteration is safe
        for (auto it = lev.begin(); it != lev.end() && it->first < i; ++it) {
            int64_t kk = it->first;
            int32_t lk = it->second;
            if (lk >= k) continue;
            for (const auto& e : rowpat[kk]) {
                if (e.first <= kk) continue;
                int32_t nl = lk + e.second + 1;
                if (nl <= k) {
                    auto f = lev.find(e.first);
                    if (f == lev.end()) lev[e.first] = nl;
                    else if (nl < f->second) f->second = nl;
                }
            }
        }
        auto& row = rowpat[i];
        row.assign(lev.begin(), lev.end());
        total += (int64_t)row.size();
    }
    int64_t* ip = (int64_t*)malloc((n + 1) * sizeof(int64_t));
    int64_t* cols = (int64_t*)malloc((total > 0 ? total : 1)
                                     * sizeof(int64_t));
    ip[0] = 0;
    int64_t w = 0;
    for (int64_t i = 0; i < n; ++i) {
        for (const auto& e : rowpat[i]) cols[w++] = e.first;
        ip[i + 1] = w;
    }
    *out_indptr = ip;
    *out_cols = cols;
    return total;
}

// Symbolic IC(k): column-driven level rule over the strict upper
// triangle (PetscICCLLAddSorted semantics). Output rows EXCLUDE the
// diagonal. Same malloc protocol as iluk_pattern.
int64_t icck_pattern(int64_t n, const int64_t* indptr,
                     const int32_t* indices, int64_t levels,
                     int64_t** out_indptr, int64_t** out_cols) {
    std::vector<std::vector<int64_t>> out_c(n);
    std::vector<std::vector<int32_t>> out_l(n);
    std::vector<int64_t> il(n, 0);
    std::vector<std::vector<int64_t>> bucket(n);
    int64_t total = 0;
    for (int64_t kk = 0; kk < n; ++kk) {
        std::map<int64_t, int32_t> lnk;
        for (int64_t p = indptr[kk]; p < indptr[kk + 1]; ++p)
            if (indices[p] >= kk) lnk[indices[p]] = 0;
        lnk.emplace(kk, 0);          // diagonal always present
        for (int64_t prow : bucket[kk]) {
            int64_t p0 = il[prow];
            const auto& cols_p = out_c[prow];
            const auto& lvls_p = out_l[prow];
            int32_t lev_pk = lvls_p[p0];
            for (size_t t = p0 + 1; t < cols_p.size(); ++t) {
                int32_t inc = lvls_p[t] + lev_pk + 1;
                if (inc > levels) continue;
                int64_t j = cols_p[t];
                auto f = lnk.find(j);
                if (f == lnk.end()) lnk[j] = inc;
                else if (f->second > inc) f->second = inc;
            }
            int64_t nxt = p0 + 1;
            if (nxt < (int64_t)cols_p.size()) {
                il[prow] = nxt;
                bucket[cols_p[nxt]].push_back(prow);
            }
        }
        bucket[kk].clear();
        for (const auto& e : lnk) {
            if (e.first > kk) {
                out_c[kk].push_back(e.first);
                out_l[kk].push_back(e.second);
            }
        }
        total += (int64_t)out_c[kk].size();
        if (!out_c[kk].empty()) {
            il[kk] = 0;
            bucket[out_c[kk][0]].push_back(kk);
        }
    }
    int64_t* ip = (int64_t*)malloc((n + 1) * sizeof(int64_t));
    int64_t* cols = (int64_t*)malloc((total > 0 ? total : 1)
                                     * sizeof(int64_t));
    ip[0] = 0;
    int64_t w = 0;
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t c : out_c[i]) cols[w++] = c;
        ip[i + 1] = w;
    }
    *out_indptr = ip;
    *out_cols = cols;
    return total;
}

// Numeric incomplete Cholesky A ≈ (I+U)ᵀ D (I+U) restricted to the
// strict-upper pattern (ui, uj), with the MatPivotCheck shift family:
// shift_type: 0=none, 1=nonzero, 2=inblocks, 3=positive_definite.
// Fills uv (STORED AS THE NEGATED UNIT-UPPER FACTOR, matching the
// Python icc_factor return) and d. Returns nshift >= 0 on success,
// -(k+1) on an unshifted zero pivot at row k (shift_type none).
// shift_out[0] = final shift used. The A arrays must be sorted-CSR.
int64_t icc_numeric(int64_t n, const int64_t* ai, const int32_t* aj,
                    const double* aa, const int64_t* ui, const int64_t* uj,
                    double* uv, double* d, int32_t shift_type,
                    double zeropivot, double shift_amount,
                    double* shift_out) {
    double shift_top = 0.0;
    if (shift_type == 3) {
        shift_top = zeropivot;
        for (int64_t i = 0; i < n; ++i) {
            double dval = 0.0, rs = 0.0;
            for (int64_t p = ai[i]; p < ai[i + 1]; ++p) {
                rs += std::fabs(aa[p]);
                if (aj[p] == i) dval = aa[p];
            }
            rs -= std::fabs(dval) + dval;
            if (rs > shift_top) shift_top = rs;
        }
        shift_top *= 1.1;
    }
    int64_t nshift = 0;
    const int64_t nshift_max = 5;
    double shift_lo = 0.0, shift_hi = 1.0, shift_fraction = 0.0;
    double cur_shift = 0.0;
    std::vector<double> rtmp(n, 0.0);
    std::vector<int64_t> il(n, 0);
    std::vector<std::vector<int64_t>> bucket(n);
    for (;;) {
        bool newshift = false;
        for (int64_t i = 0; i < n; ++i) { il[i] = 0; bucket[i].clear(); }
        for (int64_t k = 0; k < n; ++k) {
            for (int64_t p = ui[k]; p < ui[k + 1]; ++p) rtmp[uj[p]] = 0.0;
            double dk = cur_shift;
            for (int64_t p = ai[k]; p < ai[k + 1]; ++p) {
                if (aj[p] == k) dk += aa[p];
                else if (aj[p] > k) rtmp[aj[p]] = aa[p];
            }
            for (int64_t i : bucket[k]) {
                int64_t ili = il[i];
                double stored = uv[ili];
                double uikdi = -stored / d[i];
                dk += uikdi * stored;
                uv[ili] = uikdi;
                int64_t nxt = ili + 1;
                if (nxt < ui[i + 1]) {
                    for (int64_t p = nxt; p < ui[i + 1]; ++p)
                        rtmp[uj[p]] += uikdi * uv[p];
                    il[i] = nxt;
                    bucket[uj[nxt]].push_back(i);
                }
            }
            bucket[k].clear();
            double rs = 0.0;
            for (int64_t p = ui[k]; p < ui[k + 1]; ++p) {
                uv[p] = rtmp[uj[p]];
                rs += std::fabs(uv[p]);
            }
            if (ui[k + 1] > ui[k]) {
                il[k] = ui[k];
                bucket[uj[ui[k]]].push_back(k);
            }
            if (shift_type == 3) {                      // positive_definite
                if (dk <= zeropivot * rs) {
                    if (nshift == nshift_max) shift_fraction = shift_hi;
                    else {
                        shift_lo = shift_fraction;
                        shift_fraction = (shift_hi + shift_lo) / 2.0;
                    }
                    cur_shift = shift_fraction * shift_top;
                    ++nshift;
                    newshift = true;
                    break;
                }
            } else if (shift_type == 1) {               // nonzero
                if (std::fabs(dk) <= zeropivot * rs) {
                    cur_shift = (nshift == 0) ? shift_amount
                                              : cur_shift * 2.0;
                    ++nshift;
                    newshift = true;
                    break;
                }
            } else if (shift_type == 2) {               // inblocks
                if (std::fabs(dk) <= zeropivot) {
                    dk += shift_amount;
                    ++nshift;
                }
            } else {                                    // none
                if (std::fabs(dk) <= zeropivot) return -(k + 1);
            }
            d[k] = dk;
        }
        if (!newshift) break;
    }
    // negate to return the unit-upper factor (matching icc_factor)
    for (int64_t p = 0; p < ui[n]; ++p) uv[p] = -uv[p];
    shift_out[0] = cur_shift;
    return nshift;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Multilevel k-way graph partitioner (round 3). The reference delegates this
// to ParMetis (src/mat/partition/impls/pmetis/pmetis.c); matrices without
// coordinates previously only had RCM-band strip partitioning, which gives
// poor halo volume on non-bandable graphs. Classic multilevel scheme:
//   coarsen by heavy-edge matching -> greedy-growing initial k-way partition
//   on the coarsest graph -> project back, boundary FM-style refinement at
//   every level (balance tolerance 3%).
// Deterministic: an xorshift PRNG seeded by the caller drives all tie-breaks.
// ---------------------------------------------------------------------------

namespace kwaypart {

struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
    uint64_t next() {
        s ^= s << 13; s ^= s >> 7; s ^= s << 17;
        return s;
    }
    int64_t below(int64_t n) { return (int64_t)(next() % (uint64_t)n); }
};

struct Graph {
    int64_t n = 0;
    std::vector<int64_t> xadj;
    std::vector<int32_t> adj;
    std::vector<int64_t> ew;    // edge weights
    std::vector<int64_t> vw;    // vertex weights
    std::vector<int32_t> cmap;  // this level's vertex -> coarser vertex
};

// Heavy-edge matching coarsening: returns the coarser graph and fills
// fine.cmap. No progress (shrink < 5%) => returns a graph with n == fine.n
// (caller stops). maxvwgt caps merged vertex weight (keeps hub-heavy
// graphs partitionable — the METIS rule).
static Graph coarsen_hem(Graph& g, Rng& rng, int64_t maxvwgt) {
    const int64_t n = g.n;
    std::vector<int32_t> match(n, -1);
    std::vector<int64_t> perm(n);
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    for (int64_t i = n - 1; i > 0; --i)
        std::swap(perm[i], perm[rng.below(i + 1)]);

    int64_t ncoarse = 0;
    g.cmap.assign(n, -1);
    for (int64_t t = 0; t < n; ++t) {
        int64_t v = perm[t];
        if (match[v] >= 0) continue;
        int64_t best = -1, bw = -1;
        for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p) {
            int32_t u = g.adj[p];
            if (u == v || match[u] >= 0) continue;
            if (g.vw[v] + g.vw[u] > maxvwgt) continue;
            if (g.ew[p] > bw) { bw = g.ew[p]; best = u; }
        }
        if (best >= 0) {
            match[v] = (int32_t)best;
            match[best] = (int32_t)v;
            g.cmap[v] = g.cmap[best] = (int32_t)ncoarse++;
        } else {
            match[v] = (int32_t)v;
            g.cmap[v] = (int32_t)ncoarse++;
        }
    }
    Graph c;
    c.n = ncoarse;
    if (ncoarse > n - n / 20) { c.n = n; return c; }  // too little progress

    c.vw.assign(ncoarse, 0);
    for (int64_t v = 0; v < n; ++v) c.vw[g.cmap[v]] += g.vw[v];
    // coarse adjacency via marker array
    c.xadj.assign(ncoarse + 1, 0);
    std::vector<int64_t> mark(ncoarse, -1);
    std::vector<int32_t> cols;
    std::vector<int64_t> wts;
    c.adj.reserve(g.adj.size());
    c.ew.reserve(g.adj.size());
    // group fine vertices by coarse id
    std::vector<int64_t> head(ncoarse, -1), nxt(n, -1);
    for (int64_t v = n - 1; v >= 0; --v) {
        nxt[v] = head[g.cmap[v]];
        head[g.cmap[v]] = v;
    }
    for (int64_t cv = 0; cv < ncoarse; ++cv) {
        cols.clear(); wts.clear();
        for (int64_t v = head[cv]; v >= 0; v = nxt[v]) {
            for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p) {
                int64_t cu = g.cmap[g.adj[p]];
                if (cu == cv) continue;          // drop self-loops
                if (mark[cu] < 0) {
                    mark[cu] = (int64_t)cols.size();
                    cols.push_back((int32_t)cu);
                    wts.push_back(g.ew[p]);
                } else {
                    wts[mark[cu]] += g.ew[p];
                }
            }
        }
        for (int32_t cu : cols) mark[cu] = -1;
        for (size_t i = 0; i < cols.size(); ++i) {
            c.adj.push_back(cols[i]);
            c.ew.push_back(wts[i]);
        }
        c.xadj[cv + 1] = (int64_t)c.adj.size();
    }
    return c;
}

// Greedy graph-growing initial k-way partition on the coarsest graph.
static void initial_partition(const Graph& g, int64_t nparts, Rng& rng,
                              std::vector<int32_t>& part) {
    const int64_t n = g.n;
    part.assign(n, -1);
    int64_t totw = 0;
    for (int64_t v = 0; v < n; ++v) totw += g.vw[v];
    int64_t remaining = totw;
    int64_t assigned = 0;
    std::vector<int32_t> frontier;
    for (int64_t p = 0; p + 1 < nparts; ++p) {
        int64_t target = remaining / (nparts - p);
        int64_t w = 0;
        // seed: an unassigned vertex adjacent to the assigned region if
        // possible (keeps parts contiguous), else random unassigned
        int64_t seed = -1;
        for (int32_t f : frontier)
            if (part[f] < 0) { seed = f; break; }
        if (seed < 0) {
            int64_t k = rng.below(n - assigned);
            for (int64_t v = 0; v < n; ++v)
                if (part[v] < 0 && k-- == 0) { seed = v; break; }
        }
        frontier.clear();
        std::queue<int32_t> q;
        q.push((int32_t)seed);
        part[seed] = (int32_t)p;
        w += g.vw[seed]; ++assigned;
        while (w < target && (assigned < n)) {
            if (q.empty()) {        // disconnected: jump to a new seed
                int64_t s2 = -1;
                for (int64_t v = 0; v < n; ++v)
                    if (part[v] < 0) { s2 = v; break; }
                if (s2 < 0) break;
                q.push((int32_t)s2);
                part[s2] = (int32_t)p;
                w += g.vw[s2]; ++assigned;
                continue;
            }
            int32_t v = q.front(); q.pop();
            for (int64_t e = g.xadj[v]; e < g.xadj[v + 1]; ++e) {
                int32_t u = g.adj[e];
                if (part[u] >= 0) continue;
                part[u] = (int32_t)p;
                w += g.vw[u]; ++assigned;
                q.push(u);
                if (w >= target) break;
            }
        }
        // remember boundary for the next part's seeding
        while (!q.empty()) {
            int32_t v = q.front(); q.pop();
            for (int64_t e = g.xadj[v]; e < g.xadj[v + 1]; ++e)
                if (part[g.adj[e]] < 0) frontier.push_back(g.adj[e]);
        }
        remaining -= w;
    }
    for (int64_t v = 0; v < n; ++v)
        if (part[v] < 0) part[v] = (int32_t)(nparts - 1);
}

// Greedy boundary k-way refinement (FM-style, positive-gain moves plus
// zero-gain balance moves), respecting maxw = (1+eps) * avg.
static void refine_kway(const Graph& g, int64_t nparts,
                        std::vector<int32_t>& part, int npasses) {
    const int64_t n = g.n;
    std::vector<int64_t> pw(nparts, 0);
    int64_t totw = 0;
    for (int64_t v = 0; v < n; ++v) { pw[part[v]] += g.vw[v]; totw += g.vw[v]; }
    const int64_t maxw = (int64_t)((1.0 + 0.03) * (double)totw
                                   / (double)nparts) + 1;
    std::vector<int64_t> conn(nparts, 0);
    std::vector<int32_t> touched;
    for (int pass = 0; pass < npasses; ++pass) {
        int64_t moved = 0;
        for (int64_t v = 0; v < n; ++v) {
            const int32_t pv = part[v];
            touched.clear();
            bool boundary = false;
            for (int64_t e = g.xadj[v]; e < g.xadj[v + 1]; ++e) {
                int32_t pu = part[g.adj[e]];
                if (conn[pu] == 0) touched.push_back(pu);
                conn[pu] += g.ew[e];
                if (pu != pv) boundary = true;
            }
            if (boundary) {
                const int64_t id = conn[pv];
                int32_t best = -1;
                int64_t bestgain = 0;
                const bool overweight = pw[pv] > maxw;
                for (int32_t pu : touched) {
                    if (pu == pv) continue;
                    if (pw[pu] + g.vw[v] > maxw) continue;
                    int64_t gain = conn[pu] - id;
                    if (gain > bestgain ||
                        (gain == bestgain && best >= 0 &&
                         pw[pu] < pw[best]) ||
                        (gain == 0 && best < 0 &&
                         pw[pu] + g.vw[v] < pw[pv]) ||
                        (overweight && best < 0)) {    // forced balance:
                        best = pu; bestgain = gain;    // accept any move
                    }                                  // out of a fat part
                }
                if (best >= 0 && pw[pv] > g.vw[v]) {   // never empty a part
                    part[v] = best;
                    pw[pv] -= g.vw[v];
                    pw[best] += g.vw[v];
                    ++moved;
                }
            }
            for (int32_t pu : touched) conn[pu] = 0;
        }
        if (moved == 0) break;
    }
}

static int64_t cut_of(const Graph& g, const std::vector<int32_t>& part) {
    int64_t cut = 0;
    for (int64_t v = 0; v < g.n; ++v)
        for (int64_t e = g.xadj[v]; e < g.xadj[v + 1]; ++e)
            if (part[g.adj[e]] != part[v]) cut += g.ew[e];
    return cut / 2;
}

}  // namespace kwaypart

extern "C" {

// Blocked UᵀDU factorization over a given strict-upper BLOCK pattern
// (MatCholeskyFactorNumeric_SeqSBAIJ_N, sbaijfact.c): bs×bs block
// pivots D_k, unit-block-diagonal U. Inputs: the block-CSR of A's
// upper triangle INCLUDING diagonal blocks (ab: nb+1 indptr, abj
// cols, abv values [bs*bs] row-major per block), the factor pattern
// (ui/uj strict upper). Outputs: uv (pattern blocks of U), dv (nb
// diagonal blocks). Dense per-block work is O(bs^3). Returns 0, or
// (k+1) when block pivot k is singular.
int64_t sbaij_block_udu(int64_t nb, int64_t bs,
                        const int64_t* ai, const int64_t* aj,
                        const double* av,
                        const int64_t* ui, const int64_t* uj,
                        double* uv, double* dv, double shift) {
    const int64_t b2 = bs * bs;
    // dense LU-based inverse of a bs×bs block (partial pivoting)
    std::vector<double> w(b2), inv(b2);
    std::vector<int64_t> piv(bs);
    auto invert = [&](const double* M, double* out) -> bool {
        std::copy(M, M + b2, w.begin());
        for (int64_t i = 0; i < bs; ++i)
            for (int64_t j = 0; j < bs; ++j)
                out[i * bs + j] = (i == j) ? 1.0 : 0.0;
        for (int64_t c = 0; c < bs; ++c) {
            int64_t p = c;
            for (int64_t r = c + 1; r < bs; ++r)
                if (std::fabs(w[r * bs + c]) > std::fabs(w[p * bs + c]))
                    p = r;
            if (w[p * bs + c] == 0.0) return false;
            if (p != c) {
                for (int64_t j = 0; j < bs; ++j) {
                    std::swap(w[p * bs + j], w[c * bs + j]);
                    std::swap(out[p * bs + j], out[c * bs + j]);
                }
            }
            const double d = w[c * bs + c];
            for (int64_t j = 0; j < bs; ++j) {
                w[c * bs + j] /= d;
                out[c * bs + j] /= d;
            }
            for (int64_t r = 0; r < bs; ++r) {
                if (r == c) continue;
                const double f = w[r * bs + c];
                if (f == 0.0) continue;
                for (int64_t j = 0; j < bs; ++j) {
                    w[r * bs + j] -= f * w[c * bs + j];
                    out[r * bs + j] -= f * out[c * bs + j];
                }
            }
        }
        return true;
    };
    // acc[j] accumulator blocks for the current row, keyed by column
    std::vector<double> acc((size_t)0);
    std::vector<int64_t> accpos(nb, -1);
    std::vector<double> accbuf;
    std::vector<int64_t> acccols;
    std::vector<double> D((size_t)nb * b2, 0.0);
    std::vector<double> M(b2), T(b2);
    // colbucket[k]: rows i<k with k in pattern(i), plus position
    std::vector<std::vector<std::pair<int64_t, int64_t>>> bucket(nb);
    for (int64_t k = 0; k < nb; ++k) {
        acccols.clear();
        accbuf.clear();
        auto acc_of = [&](int64_t j) -> double* {
            if (accpos[j] < 0) {
                accpos[j] = (int64_t)acccols.size();
                acccols.push_back(j);
                accbuf.resize(accbuf.size() + b2, 0.0);
            }
            return accbuf.data() + accpos[j] * b2;
        };
        // seed with A's blocks (upper incl. diagonal)
        {
            double* d = acc_of(k);
            for (int64_t t = 0; t < bs; ++t) d[t * bs + t] += shift;
        }
        for (int64_t t = ai[k]; t < ai[k + 1]; ++t) {
            if (aj[t] < k) continue;
            double* d = acc_of(aj[t]);
            for (int64_t q = 0; q < b2; ++q) d[q] += av[t * b2 + q];
        }
        // pattern slots must exist even if A has no block there
        for (int64_t t = ui[k]; t < ui[k + 1]; ++t) (void)acc_of(uj[t]);
        // subtract U_ikᵀ D_i U_ij for prior rows i with k in pattern
        for (auto& pr : bucket[k]) {
            const int64_t i = pr.first, tik = pr.second;
            const double* Uik = uv + tik * b2;
            const double* Di = D.data() + i * b2;
            // M = Uikᵀ · D_i
            for (int64_t r = 0; r < bs; ++r)
                for (int64_t c = 0; c < bs; ++c) {
                    double s = 0.0;
                    for (int64_t q = 0; q < bs; ++q)
                        s += Uik[q * bs + r] * Di[q * bs + c];
                    M[r * bs + c] = s;
                }
            for (int64_t t = ui[i]; t < ui[i + 1]; ++t) {
                const int64_t j = uj[t];
                if (j < k || accpos[j] < 0) continue;
                const double* Uij = uv + t * b2;
                double* d = accbuf.data() + accpos[j] * b2;
                for (int64_t r = 0; r < bs; ++r)
                    for (int64_t c = 0; c < bs; ++c) {
                        double s = 0.0;
                        for (int64_t q = 0; q < bs; ++q)
                            s += M[r * bs + q] * Uij[q * bs + c];
                        d[r * bs + c] -= s;
                    }
            }
        }
        // D_k and U_kj = D_k⁻¹ acc[j]
        std::copy(accbuf.data() + accpos[k] * b2,
                  accbuf.data() + accpos[k] * b2 + b2,
                  D.data() + k * b2);
        if (!invert(D.data() + k * b2, inv.data())) return k + 1;
        for (int64_t t = ui[k]; t < ui[k + 1]; ++t) {
            const double* a = accbuf.data() + accpos[uj[t]] * b2;
            double* u = uv + t * b2;
            for (int64_t r = 0; r < bs; ++r)
                for (int64_t c = 0; c < bs; ++c) {
                    double s = 0.0;
                    for (int64_t q = 0; q < bs; ++q)
                        s += inv[r * bs + q] * a[q * bs + c];
                    u[r * bs + c] = s;
                }
            bucket[uj[t]].push_back({k, t});
        }
        for (int64_t j : acccols) accpos[j] = -1;
    }
    std::copy(D.begin(), D.end(), dv);
    return 0;
}

// Multilevel k-way partition of an undirected CSR graph (symmetric
// pattern assumed; self-loops ignored). ewts may be NULL (unit weights).
// Fills part[n]; returns the weighted edge cut (>= 0) or -1 on error.
int64_t kway_partition(int64_t n, const int64_t* indptr,
                       const int32_t* indices, const int64_t* ewts,
                       int64_t nparts, uint64_t seed, int32_t* part) {
    using namespace kwaypart;
    if (n <= 0 || nparts <= 0) return -1;
    if (nparts == 1) {
        for (int64_t v = 0; v < n; ++v) part[v] = 0;
        return 0;
    }
    Rng rng(seed);
    std::vector<Graph> levels(1);
    Graph& g0 = levels[0];
    g0.n = n;
    g0.xadj.assign(indptr, indptr + n + 1);
    g0.adj.assign(indices, indices + indptr[n]);
    if (ewts) g0.ew.assign(ewts, ewts + indptr[n]);
    else g0.ew.assign(indptr[n], 1);
    g0.vw.assign(n, 1);

    const int64_t coarse_target = std::max<int64_t>(30 * nparts, 200);
    const int64_t maxvwgt = std::max<int64_t>(1, (3 * n) / (2 * coarse_target));
    while (levels.back().n > coarse_target) {
        Graph c = coarsen_hem(levels.back(), rng, maxvwgt);
        if (c.n >= levels.back().n) break;
        levels.push_back(std::move(c));
    }

    // initial partition on the coarsest graph: 4 seeded tries, keep best
    const Graph& gc = levels.back();
    std::vector<int32_t> best, cur;
    int64_t bestcut = -1;
    for (int t = 0; t < 4; ++t) {
        initial_partition(gc, nparts, rng, cur);
        refine_kway(gc, nparts, cur, 10);
        int64_t c = cut_of(gc, cur);
        if (bestcut < 0 || c < bestcut) { bestcut = c; best = cur; }
    }

    // uncoarsen + refine
    for (int64_t l = (int64_t)levels.size() - 2; l >= 0; --l) {
        const Graph& gf = levels[l];
        cur.assign(gf.n, 0);
        for (int64_t v = 0; v < gf.n; ++v) cur[v] = best[gf.cmap[v]];
        refine_kway(gf, nparts, cur, 8);
        best = cur;
    }
    for (int64_t v = 0; v < n; ++v) part[v] = best[v];
    return cut_of(levels[0], best);
}

}  // extern "C"
