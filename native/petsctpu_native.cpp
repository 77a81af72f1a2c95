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
