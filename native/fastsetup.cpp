// Native host-side setup kernels for pyfem_gpu_testflight_tpu.
//
// The framework's device compute is JAX/XLA/Pallas; host-side mesh setup
// (sparsity patterns for the scipy-export/direct path) is dominated by a
// sort+unique over nelems * ndpe^2 int64 keys — tens of millions of
// entries that NumPy sorts in one slow pass on throttled container CPUs.
// This file provides the same primitives as a small C++ library with
// OpenMP-parallel sorting, loaded via ctypes (see
// pyfem_gpu_testflight_tpu/native.py; NumPy fallback is always available).
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#include <parallel/algorithm>
#define SORT __gnu_parallel::sort
#else
#define SORT std::sort
#endif

extern "C" {

// Sorted-unique with inverse map: on return, unique_out holds the
// n_unique sorted distinct keys and inverse_out[i] is the index of
// keys[i] within unique_out.  Caller allocates unique_out with capacity
// >= n and inverse_out with n entries.  Returns n_unique (or -1).
//
// FEM sparsity keys are row*N + col, rows bounded by N and ~tens of
// entries per row, so instead of a global O(n log n) sort this buckets
// by row (two O(n) passes) and insertion-sorts the tiny per-row buckets
// — linear time, cache-friendly, fast even on one throttled core.
int64_t unique_inverse_i64_keys(const int64_t* keys, int64_t n, int64_t nrows,
                                const int64_t* rows, int64_t* unique_out,
                                int32_t* inverse_out) {
  if (n <= 0) return 0;
  // pass 1: histogram rows -> bucket offsets
  std::vector<int64_t> offs(nrows + 1, 0);
  for (int64_t i = 0; i < n; ++i) offs[rows[i] + 1]++;
  for (int64_t r = 0; r < nrows; ++r) offs[r + 1] += offs[r];
  // pass 2: scatter original indices into row buckets
  std::vector<int64_t> bucket(n);
  {
    std::vector<int64_t> cur(offs.begin(), offs.end() - 1);
    for (int64_t i = 0; i < n; ++i) bucket[cur[rows[i]]++] = i;
  }
  // pass 3: per-row insertion sort (by key) + dedup + inverse
  int64_t n_unique = 0;
  std::vector<int64_t> idx;
  for (int64_t r = 0; r < nrows; ++r) {
    int64_t lo = offs[r], hi = offs[r + 1];
    if (lo == hi) continue;
    idx.assign(bucket.begin() + lo, bucket.begin() + hi);
    for (size_t a = 1; a < idx.size(); ++a) {  // insertion sort by key
      int64_t v = idx[a];
      int64_t kv = keys[v];
      size_t b = a;
      while (b > 0 && keys[idx[b - 1]] > kv) {
        idx[b] = idx[b - 1];
        --b;
      }
      idx[b] = v;
    }
    for (size_t a = 0; a < idx.size(); ++a) {
      if (a == 0 || keys[idx[a]] != unique_out[n_unique - 1]) {
        unique_out[n_unique++] = keys[idx[a]];
      }
      inverse_out[idx[a]] = static_cast<int32_t>(n_unique - 1);
    }
  }
  return n_unique;
}

// Generic fallback entry point (global sort) kept for non-FEM keys.
int64_t unique_inverse_i64(const int64_t* keys, int64_t n,
                           int64_t* unique_out, int32_t* inverse_out) {
  if (n <= 0) return 0;
  std::vector<int64_t> sorted(keys, keys + n);
  SORT(sorted.begin(), sorted.end());
  int64_t n_unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (n_unique == 0 || sorted[i] != unique_out[n_unique - 1]) {
      unique_out[n_unique++] = sorted[i];
    }
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const int64_t* lo = unique_out;
    const int64_t* hi = unique_out + n_unique;
    const int64_t* it = std::lower_bound(lo, hi, keys[i]);
    inverse_out[i] = static_cast<int32_t>(it - lo);
  }
  return n_unique;
}

// Row/column expansion for the element sparsity pattern:
// rows[e * ndpe^2 + i * ndpe + j] = conn_dof[e, i],
// cols[...same...]               = conn_dof[e, j].
void expand_pattern_i64(const int64_t* conn_dof, int64_t nelems,
                        int64_t ndpe, int64_t* rows, int64_t* cols) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t e = 0; e < nelems; ++e) {
    const int64_t* cd = conn_dof + e * ndpe;
    int64_t* r = rows + e * ndpe * ndpe;
    int64_t* c = cols + e * ndpe * ndpe;
    for (int64_t i = 0; i < ndpe; ++i) {
      for (int64_t j = 0; j < ndpe; ++j) {
        r[i * ndpe + j] = cd[i];
        c[i * ndpe + j] = cd[j];
      }
    }
  }
}

// Greedy BFS aggregation on a CSR graph (smoothed-aggregation AMG
// setup, see pyfem_gpu_testflight_tpu/unstructured.py).  Two passes:
// roots with fully-unaggregated neighborhoods absorb their neighbors;
// leftovers attach to an aggregated neighbor (or become singletons).
// Returns the number of aggregates; agg_out[i] in [0, n_agg).
int64_t greedy_aggregate_csr(const int64_t* indptr, const int64_t* indices,
                             int64_t n, int64_t* agg_out) {
  std::fill(agg_out, agg_out + n, int64_t(-1));
  int64_t next_id = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (agg_out[i] >= 0) continue;
    bool clean = true;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      if (agg_out[indices[p]] >= 0) { clean = false; break; }
    }
    if (!clean) continue;
    agg_out[i] = next_id;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      agg_out[indices[p]] = next_id;
    }
    next_id++;
  }
  for (int64_t i = 0; i < n; ++i) {
    if (agg_out[i] >= 0) continue;
    int64_t found = -1;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      if (agg_out[indices[p]] >= 0) { found = agg_out[indices[p]]; break; }
    }
    agg_out[i] = (found >= 0) ? found : next_id++;
  }
  return next_id;
}

}  // extern "C"
