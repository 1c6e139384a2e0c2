// Native CF kernels: blockwise top-k similarities + Swing scores.
//
// This is the C++ replacement for the reference's native tier:
//   - libreco/utils/_similarities.pyx:17,73 (Cython/OpenMP cosine/pearson/
//     jaccard, invert-index accumulation, min_common threshold)
//   - rust/src/{user_cf.rs,item_cf.rs,similarities.rs} (recfarm rayon sims)
//   - rust/src/graph.rs:200 (Swing user-pair scores)
//
// Exposed as extern "C" for ctypes (pybind11 is not available in this image).
// Values for cosine/pearson are pre-normalized on the Python side so the
// accumulated dot product IS the similarity; jaccard passes indicator data
// and finalizes common/(nnz_x + nnz_y - common).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Fused CSR row-normalize + transpose, the fixed-cost preprocessing in
// front of the top-k kernels. The numpy build in this image runs float64
// SIMD ~100x below float32 speed, which makes scipy's normalize/transpose
// (internally float64) the dominant cost of an incremental similarity
// update — this kernel replaces that whole host-side pipeline.
//
// kind: 0 cosine (L2-normalize rows), 1 pearson (center row nonzeros by the
// row mean, then L2-normalize), 2 jaccard (binarize to 1.0), 3 passthrough
// (transpose only). Outputs the normalized data (same sparsity as x) plus
// the CSR of the transposed normalized matrix. The transpose scatter is
// sequential and row-ordered, so yt rows (columns of x) come out sorted by
// x-row — deterministic accumulation order in the top-k kernels.
void csr_preprocess_transpose(
    const int64_t* x_indptr, const int32_t* x_indices, const float* x_data,
    int32_t n_rows, int32_t n_cols, int32_t kind,
    float* out_data,
    int64_t* yt_indptr, int32_t* yt_indices, float* yt_data,
    int32_t n_threads) {
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
  const int64_t nnz = x_indptr[n_rows];
  // Pre-fault the freshly-allocated output pages in parallel: this VM's
  // page-zeroing runs at ~40MB/s single-threaded and would otherwise
  // dominate the sequential scatter below.
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < nnz; p += 1024) {
    yt_indices[p] = 0;
    yt_data[p] = 0.0f;
    out_data[p] = 0.0f;
  }
#pragma omp parallel for schedule(static)
  for (int32_t r = 0; r < n_rows; ++r) {
    const int64_t b = x_indptr[r], e = x_indptr[r + 1];
    if (kind == 2) {
      for (int64_t p = b; p < e; ++p) out_data[p] = 1.0f;
      continue;
    }
    if (kind == 3) {
      for (int64_t p = b; p < e; ++p) out_data[p] = x_data[p];
      continue;
    }
    float mean = 0.0f;
    if (kind == 1) {
      double s = 0.0;
      for (int64_t p = b; p < e; ++p) s += x_data[p];
      mean = (float)(s / (double)std::max<int64_t>(e - b, 1));
    }
    double sq = 0.0;
    for (int64_t p = b; p < e; ++p) {
      const float v = x_data[p] - mean;
      out_data[p] = v;
      sq += (double)v * v;
    }
    const float inv = 1.0f / std::max((float)std::sqrt(sq), 1e-10f);
    for (int64_t p = b; p < e; ++p) out_data[p] *= inv;
  }
  // counting-sort transpose, parallel + stable: threads own contiguous row
  // blocks; per-thread column cursors keep the output ordered by x-row
  // (deterministic accumulation order downstream) while spreading the
  // TLB-miss-bound random writes across cores.
  int ntr =
#ifdef _OPENMP
      n_threads > 0 ? n_threads : omp_get_max_threads();
#else
      1;
#endif
  if ((int64_t)n_cols * ntr > (int64_t)64 * 1024 * 1024) ntr = 1;
  std::vector<std::vector<int64_t>> hist(ntr);
  const int32_t chunk = (n_rows + ntr - 1) / ntr;
#pragma omp parallel num_threads(ntr)
  {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    auto& h = hist[tid];
    h.assign(n_cols, 0);
    const int32_t r0 = tid * chunk;
    const int32_t r1 = std::min(n_rows, r0 + chunk);
    const int64_t p0 = r0 < n_rows ? x_indptr[r0] : nnz;
    const int64_t p1 = r1 < n_rows ? x_indptr[r1] : nnz;
    for (int64_t p = p0; p < p1; ++p) ++h[x_indices[p]];
  }
  yt_indptr[0] = 0;
  for (int32_t c = 0; c < n_cols; ++c) {
    int64_t total = 0;
    for (int t = 0; t < ntr; ++t) {
      const int64_t h = hist[t][c];
      hist[t][c] = yt_indptr[c] + total;  // becomes this thread's cursor
      total += h;
    }
    yt_indptr[c + 1] = yt_indptr[c] + total;
  }
#pragma omp parallel num_threads(ntr)
  {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    auto& cursor = hist[tid];
    const int32_t r0 = tid * chunk;
    const int32_t r1 = std::min(n_rows, r0 + chunk);
    for (int32_t r = r0; r < r1; ++r) {
      for (int64_t p = x_indptr[r]; p < x_indptr[r + 1]; ++p) {
        const int64_t q = cursor[x_indices[p]]++;
        yt_indices[q] = r;
        yt_data[q] = out_data[p];
      }
    }
  }
}

// Top-k similar rows for every row of X against rows of Y.
// x CSR: (n_x rows over n_dim columns); yt CSR of Y^T: for each dim, the
// y-rows containing it. out_ids/out_sims are (n_x, k), padded with -1/0.
void topk_similarities(
    const int64_t* x_indptr, const int32_t* x_indices, const float* x_data,
    int32_t n_x,
    const int64_t* yt_indptr, const int32_t* yt_indices, const float* yt_data,
    int32_t n_dim, int32_t n_y,
    const float* x_nnz, const float* y_nnz,
    int32_t k, int32_t min_common, int32_t jaccard, int32_t exclude_self,
    int32_t* out_ids, float* out_sims, int32_t n_threads) {
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
#pragma omp parallel
  {
    std::vector<float> acc(n_y, 0.0f);
    std::vector<int32_t> common(n_y, 0);
    std::vector<int32_t> touched;
    touched.reserve(4096);
#pragma omp for schedule(dynamic, 16)
    for (int32_t x = 0; x < n_x; ++x) {
      touched.clear();
      for (int64_t p = x_indptr[x]; p < x_indptr[x + 1]; ++p) {
        const int32_t dim = x_indices[p];
        const float xv = x_data[p];
        for (int64_t q = yt_indptr[dim]; q < yt_indptr[dim + 1]; ++q) {
          const int32_t y = yt_indices[q];
          if (common[y] == 0) touched.push_back(y);
          acc[y] += xv * yt_data[q];
          common[y] += 1;
        }
      }
      // score + filter
      std::vector<std::pair<float, int32_t>> cands;
      cands.reserve(touched.size());
      for (const int32_t y : touched) {
        if (common[y] >= min_common && !(exclude_self && y == x)) {
          float sim;
          if (jaccard) {
            const float denom = x_nnz[x] + y_nnz[y] - (float)common[y];
            sim = denom > 0.0f ? (float)common[y] / denom : 0.0f;
          } else {
            sim = acc[y];
          }
          cands.emplace_back(sim, y);
        }
        acc[y] = 0.0f;
        common[y] = 0;
      }
      const int32_t take = std::min((int64_t)k, (int64_t)cands.size());
      std::partial_sort(
          cands.begin(), cands.begin() + take, cands.end(),
          [](const std::pair<float, int32_t>& a,
             const std::pair<float, int32_t>& b) {
            return a.first > b.first || (a.first == b.first && a.second < b.second);
          });
      for (int32_t j = 0; j < k; ++j) {
        if (j < take) {
          out_ids[(int64_t)x * k + j] = cands[j].second;
          out_sims[(int64_t)x * k + j] = cands[j].first;
        } else {
          out_ids[(int64_t)x * k + j] = -1;
          out_sims[(int64_t)x * k + j] = 0.0f;
        }
      }
    }
  }
}

// Incremental top-k similarity update for CF retrain.
//
// Counterpart of the reference's rust/src/incremental.rs (wired via
// libreco/bases/cf_base_rs.py:192), redesigned to be EXACT instead of
// within-batch approximate: the caller passes the MERGED (old + new)
// interaction matrix plus the list of rows touched by new interactions.
// Touched rows get a full fresh top-k against the merged data; untouched
// rows keep their old lists with every entry that references a touched row
// replaced by its freshly-computed similarity (data only grows, so any old
// pair still meets min_common and is guaranteed to be re-emitted by the
// touched row's accumulation). Like the reference, an untouched pair that
// was evicted from a top-k list in an earlier round cannot re-enter.
//
// old_ids/old_sims hold n_x_old rows (n_x_old <= n_x after vocab growth);
// out_ids/out_sims are (n_x, k).
void update_topk_similarities(
    const int64_t* x_indptr, const int32_t* x_indices, const float* x_data,
    int32_t n_x,
    const int64_t* yt_indptr, const int32_t* yt_indices, const float* yt_data,
    int32_t n_dim,
    const float* x_nnz,
    const int32_t* touched_rows, int32_t n_touched,
    const int32_t* old_ids, const float* old_sims, int32_t n_x_old,
    int32_t k, int32_t min_common, int32_t jaccard,
    int32_t* out_ids, float* out_sims, int32_t n_threads) {
  (void)n_dim;
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
  std::vector<uint8_t> is_touched(n_x, 0);
  for (int32_t t = 0; t < n_touched; ++t) is_touched[touched_rows[t]] = 1;

  // start from empty rows; untouched old rows copy over below
  // (parallel: also spreads the first-touch page faults of the fresh
  // output buffers across cores — see csr_preprocess_transpose)
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)n_x * k; ++i) {
    out_ids[i] = -1;
    out_sims[i] = 0.0f;
  }

  const int nt =
#ifdef _OPENMP
      n_threads > 0 ? n_threads : omp_get_max_threads();
#else
      1;
#endif

  // Per-untouched-row pruning state: a fresh (x2 <- x1) candidate only
  // matters if it can enter x2's list (sim > x2's old minimum, or the list
  // is not full) or if x2's old list references a touched row (stale entry
  // to replace). Everything else is dropped at the source — this keeps the
  // symmetric fix-up O(actual updates), not O(all co-occurring pairs).
  std::vector<float> old_min(n_x_old, -3.0e38f);
  std::vector<uint8_t> refers_touched(n_x_old, 0);
#pragma omp parallel for schedule(static) num_threads(nt)
  for (int32_t x = 0; x < n_x_old; ++x) {
    if (is_touched[x]) continue;
    int32_t filled = 0;
    for (int32_t jj = 0; jj < k; ++jj) {
      const int32_t nb = old_ids[(int64_t)x * k + jj];
      if (nb < 0) break;
      ++filled;
      if (is_touched[nb]) refers_touched[x] = 1;
    }
    if (filled == k && !refers_touched[x])
      old_min[x] = old_sims[(int64_t)x * k + (filled - 1)];
  }

  struct Cand { int32_t x2, x1; float sim; };
  std::vector<std::vector<Cand>> cand_parts(nt);

#pragma omp parallel num_threads(nt)
  {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    auto& cand_out = cand_parts[tid];
    std::vector<float> acc(n_x, 0.0f);
    std::vector<int32_t> common(n_x, 0);
    std::vector<int32_t> seen;
    seen.reserve(4096);
#pragma omp for schedule(dynamic, 16)
    for (int32_t t = 0; t < n_touched; ++t) {
      const int32_t x = touched_rows[t];
      seen.clear();
      for (int64_t p = x_indptr[x]; p < x_indptr[x + 1]; ++p) {
        const int32_t dim = x_indices[p];
        const float xv = x_data[p];
        for (int64_t q = yt_indptr[dim]; q < yt_indptr[dim + 1]; ++q) {
          const int32_t y = yt_indices[q];
          if (common[y] == 0) seen.push_back(y);
          acc[y] += xv * yt_data[q];
          common[y] += 1;
        }
      }
      std::vector<std::pair<float, int32_t>> cands;
      cands.reserve(seen.size());
      for (const int32_t y : seen) {
        if (common[y] >= min_common && y != x) {
          float sim;
          if (jaccard) {
            const float denom = x_nnz[x] + x_nnz[y] - (float)common[y];
            sim = denom > 0.0f ? (float)common[y] / denom : 0.0f;
          } else {
            sim = acc[y];
          }
          cands.emplace_back(sim, y);
          if (!is_touched[y] && y < n_x_old && sim > old_min[y])
            cand_out.push_back({y, x, sim});
        }
        acc[y] = 0.0f;
        common[y] = 0;
      }
      const int32_t take = std::min((int64_t)k, (int64_t)cands.size());
      std::partial_sort(
          cands.begin(), cands.begin() + take, cands.end(),
          [](const std::pair<float, int32_t>& a,
             const std::pair<float, int32_t>& b) {
            return a.first > b.first || (a.first == b.first && a.second < b.second);
          });
      for (int32_t j = 0; j < take; ++j) {
        out_ids[(int64_t)x * k + j] = cands[j].second;
        out_sims[(int64_t)x * k + j] = cands[j].first;
      }
    }
  }

  // group surviving candidates by untouched row via counting sort
  size_t n_cand = 0;
  for (const auto& part : cand_parts) n_cand += part.size();
  std::vector<int64_t> bucket_ptr(n_x_old + 1, 0);
  for (const auto& part : cand_parts)
    for (const auto& c : part) ++bucket_ptr[c.x2 + 1];
  for (int32_t x = 0; x < n_x_old; ++x) bucket_ptr[x + 1] += bucket_ptr[x];
  std::vector<Cand> flat(n_cand);
  {
    std::vector<int64_t> cursor(bucket_ptr.begin(), bucket_ptr.end() - 1);
    for (const auto& part : cand_parts)
      for (const auto& c : part) flat[cursor[c.x2]++] = c;
  }

  // untouched rows: old list with touched entries replaced by fresh sims
#pragma omp parallel for schedule(dynamic, 256) num_threads(nt)
  for (int32_t x = 0; x < n_x_old; ++x) {
    if (is_touched[x]) continue;
    const int64_t cb = bucket_ptr[x], ce = bucket_ptr[x + 1];
    if (cb == ce && !refers_touched[x]) {
      // untouched and unaffected: copy the old row through
      for (int32_t j = 0; j < k; ++j) {
        out_ids[(int64_t)x * k + j] = old_ids[(int64_t)x * k + j];
        out_sims[(int64_t)x * k + j] = old_sims[(int64_t)x * k + j];
      }
      continue;
    }
    std::vector<std::pair<float, int32_t>> merged;
    merged.reserve(k + (ce - cb));
    for (int32_t j = 0; j < k; ++j) {
      const int32_t nb = old_ids[(int64_t)x * k + j];
      if (nb < 0) break;
      if (is_touched[nb]) continue;  // stale; fresh value merged below
      merged.emplace_back(old_sims[(int64_t)x * k + j], nb);
    }
    for (int64_t c = cb; c < ce; ++c)
      merged.emplace_back(flat[c].sim, flat[c].x1);
    const int32_t take = std::min((int64_t)k, (int64_t)merged.size());
    std::partial_sort(
        merged.begin(), merged.begin() + take, merged.end(),
        [](const std::pair<float, int32_t>& a,
           const std::pair<float, int32_t>& b) {
          return a.first > b.first || (a.first == b.first && a.second < b.second);
        });
    for (int32_t j = 0; j < take; ++j) {
      out_ids[(int64_t)x * k + j] = merged[j].second;
      out_sims[(int64_t)x * k + j] = merged[j].first;
    }
  }
}

// Swing top-k item-item scores.
// user_indptr/user_items: CSR of user -> sorted item lists (possibly capped).
// item_indptr/item_users: CSR of item -> sorted user lists.
void swing_topk(
    const int64_t* user_indptr, const int32_t* user_items, int32_t n_users,
    const int64_t* item_indptr, const int32_t* item_users, int32_t n_items,
    float alpha, int32_t k,
    int32_t* out_ids, float* out_sims, int32_t n_threads) {
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
  // scores[i] accumulated in per-thread hash maps, merged at the end
  const int nt =
#ifdef _OPENMP
      n_threads > 0 ? n_threads : omp_get_max_threads();
#else
      1;
#endif
  std::vector<std::unordered_map<int64_t, float>> partial(nt);

#pragma omp parallel num_threads(nt)
  {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    auto& scores = partial[tid];
    std::vector<int32_t> inter;
    // per-thread partner-dedup stamps: stamp[v] == u+1 means the pair
    // (u, v) was already intersected during u's iteration. The previous
    // scheme intersected a pair once PER SHARED ITEM and kept only the
    // first (inter[0] == i) — for a pair sharing c items that computed
    // the O(|u|+|v|) intersection c times; this computes it once.
    std::vector<int32_t> stamp(n_users, 0);
#pragma omp for schedule(dynamic, 64)
    for (int32_t u = 0; u < n_users; ++u) {
      const int64_t ub = user_indptr[u], ue = user_indptr[u + 1];
      if (ue - ub < 2) continue;
      for (int64_t p = ub; p < ue; ++p) {
        const int32_t i = user_items[p];
        for (int64_t q = item_indptr[i]; q < item_indptr[i + 1]; ++q) {
          const int32_t v = item_users[q];
          if (v <= u) continue;
          if (stamp[v] == u + 1) continue;  // pair already handled
          stamp[v] = u + 1;
          // intersect sorted item lists of u and v (once per pair)
          inter.clear();
          int64_t a = ub, b = user_indptr[v];
          const int64_t aE = ue, bE = user_indptr[v + 1];
          while (a < aE && b < bE) {
            const int32_t ia = user_items[a], ib = user_items[b];
            if (ia == ib) { inter.push_back(ia); ++a; ++b; }
            else if (ia < ib) ++a;
            else ++b;
          }
          if (inter.size() < 2) continue;
          const float w = 1.0f / (alpha + (float)inter.size());
          for (size_t x1 = 0; x1 < inter.size(); ++x1)
            for (size_t x2 = 0; x2 < inter.size(); ++x2)
              if (x1 != x2)
                scores[((int64_t)inter[x1] << 32) | (uint32_t)inter[x2]] += w;
        }
      }
    }
  }
  // merge + top-k per item
  std::unordered_map<int64_t, float> merged;
  for (auto& m : partial)
    for (auto& kv : m) merged[kv.first] += kv.second;
  std::vector<std::vector<std::pair<float, int32_t>>> per_item(n_items);
  for (auto& kv : merged) {
    const int32_t i = (int32_t)(kv.first >> 32);
    const int32_t j = (int32_t)(kv.first & 0xffffffff);
    per_item[i].emplace_back(kv.second, j);
  }
#pragma omp parallel for schedule(dynamic, 64)
  for (int32_t i = 0; i < n_items; ++i) {
    auto& cands = per_item[i];
    const int32_t take = std::min((int64_t)k, (int64_t)cands.size());
    std::partial_sort(
        cands.begin(), cands.begin() + take, cands.end(),
        [](const std::pair<float, int32_t>& a,
           const std::pair<float, int32_t>& b) {
          return a.first > b.first || (a.first == b.first && a.second < b.second);
        });
    for (int32_t j = 0; j < k; ++j) {
      if (j < take) {
        out_ids[(int64_t)i * k + j] = cands[j].second;
        out_sims[(int64_t)i * k + j] = cands[j].first;
      } else {
        out_ids[(int64_t)i * k + j] = -1;
        out_sims[(int64_t)i * k + j] = 0.0f;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Native CF inference (recfarm rust/src/inference.rs analog): batch
// recommend + pair predict straight off the cached top-k neighbor lists,
// OpenMP-parallel over query users/pairs. Semantics mirror the Python
// CfBase paths exactly (bases/cf_base.py) so either tier can serve:
//   - cf_mode 0 (user-cf): scores[i] = sum_v sim(u,v) * label(v,i)
//   - cf_mode 1 (item-cf): scores[i] = sum_{c in consumed(u)} sim(c,i) * w_c
//     with w_c = label(u,c) for rating and 1.0 for ranking
//   - items whose accumulated score is exactly 0 are non-candidates
//   - consumed filtering + popular fallback fill like recommend_user.
// Interaction CSR indices must be sorted (predict binary-searches rows).

static inline float row_lookup(const int64_t* indptr, const int32_t* indices,
                               const float* data, int32_t row, int32_t col,
                               bool* found) {
  int64_t lo = indptr[row], hi = indptr[row + 1];
  while (lo < hi) {
    const int64_t mid = (lo + hi) / 2;
    if (indices[mid] < col) lo = mid + 1;
    else hi = mid;
  }
  if (lo < indptr[row + 1] && indices[lo] == col) {
    *found = true;
    return data[lo];
  }
  *found = false;
  return 0.0f;
}

void cf_recommend(
    int32_t cf_mode, int32_t task_rating,
    const int32_t* sim_ids, const float* sim_vals, int32_t k_sim,
    const int64_t* inter_indptr, const int32_t* inter_indices,
    const float* inter_data, int32_t n_users, int32_t n_items,
    const int32_t* users, int32_t n_query,
    int32_t n_rec, int32_t filter_consumed,
    const int32_t* popular, int32_t n_popular,
    int32_t* out_ids, float* out_scores, int32_t n_threads) {
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
  (void)n_users;
#pragma omp parallel
  {
    // double accumulation matches the Python paths' float64 numpy
    // accumulators (near-ties would otherwise flip the last ranks)
    std::vector<double> acc(n_items, 0.0);
    std::vector<uint8_t> blocked(n_items, 0);
    std::vector<int32_t> touched;
    std::vector<std::pair<float, int32_t>> cands;
#pragma omp for schedule(dynamic, 8)
    for (int32_t q = 0; q < n_query; ++q) {
      const int32_t u = users[q];
      touched.clear();
      cands.clear();
      if (cf_mode == 0) {
        // user-cf: accumulate sim-weighted neighbor rows
        for (int32_t j = 0; j < k_sim; ++j) {
          const int32_t v = sim_ids[(int64_t)u * k_sim + j];
          if (v < 0) continue;
          const float s = sim_vals[(int64_t)u * k_sim + j];
          for (int64_t p = inter_indptr[v]; p < inter_indptr[v + 1]; ++p) {
            const int32_t i = inter_indices[p];
            if (acc[i] == 0.0) touched.push_back(i);
            acc[i] += (double)s * (double)inter_data[p];
          }
        }
      } else {
        // item-cf: spread each consumed item's similarity row
        for (int64_t p = inter_indptr[u]; p < inter_indptr[u + 1]; ++p) {
          const int32_t c = inter_indices[p];
          const float w = task_rating ? inter_data[p] : 1.0f;
          for (int32_t j = 0; j < k_sim; ++j) {
            const int32_t nb = sim_ids[(int64_t)c * k_sim + j];
            if (nb < 0) continue;
            if (acc[nb] == 0.0) touched.push_back(nb);
            acc[nb] += (double)sim_vals[(int64_t)c * k_sim + j] * (double)w;
          }
        }
      }
      if (filter_consumed) {
        for (int64_t p = inter_indptr[u]; p < inter_indptr[u + 1]; ++p)
          blocked[inter_indices[p]] = 1;
      }
      for (const int32_t i : touched) {
        // exact-zero accumulations are non-candidates (cf_base contract)
        if (acc[i] != 0.0 && !blocked[i]) cands.emplace_back((float)acc[i], i);
      }
      const int32_t take = std::min((int64_t)n_rec, (int64_t)cands.size());
      std::partial_sort(
          cands.begin(), cands.begin() + take, cands.end(),
          [](const std::pair<float, int32_t>& a,
             const std::pair<float, int32_t>& b) {
            return a.first > b.first ||
                   (a.first == b.first && a.second < b.second);
          });
      int32_t filled = 0;
      for (; filled < take; ++filled) {
        out_ids[(int64_t)q * n_rec + filled] = cands[filled].second;
        out_scores[(int64_t)q * n_rec + filled] = cands[filled].first;
      }
      // popular fallback fill (not consumed-filtered, like the Python path)
      for (int32_t p = 0; p < n_popular && filled < n_rec; ++p) {
        const int32_t cand = popular[p];
        bool dup = false;
        for (int32_t j = 0; j < filled; ++j)
          if (out_ids[(int64_t)q * n_rec + j] == cand) { dup = true; break; }
        if (dup) continue;
        out_ids[(int64_t)q * n_rec + filled] = cand;
        out_scores[(int64_t)q * n_rec + filled] = 0.0f;
        ++filled;
      }
      for (; filled < n_rec; ++filled) {
        out_ids[(int64_t)q * n_rec + filled] = -1;
        out_scores[(int64_t)q * n_rec + filled] = 0.0f;
      }
      // reset scratch (touched-proportional, not O(n_items))
      for (const int32_t i : touched) acc[i] = 0.0;
      if (filter_consumed) {
        for (int64_t p = inter_indptr[u]; p < inter_indptr[u + 1]; ++p)
          blocked[inter_indices[p]] = 0;
      }
    }
  }
}

void cf_predict(
    int32_t cf_mode, int32_t task_rating,
    const int32_t* sim_ids, const float* sim_vals, int32_t k_sim,
    const int64_t* inter_indptr, const int32_t* inter_indices,
    const float* inter_data, int32_t n_users, int32_t n_items,
    const int32_t* users, const int32_t* items, int32_t n_pairs,
    float default_pred, float* out, int32_t n_threads) {
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
#pragma omp parallel for schedule(static)
  for (int32_t q = 0; q < n_pairs; ++q) {
    const int32_t u = users[q], i = items[q];
    if (u < 0 || u >= n_users || i < 0 || i >= n_items) {
      out[q] = default_pred;
      continue;
    }
    // neighbors come from the query-side entity; labels are looked up in
    // the other side's CSR row (binary search; indices sorted)
    const int32_t center = cf_mode == 0 ? u : i;
    double num = 0.0, den_abs = 0.0, rated_signed = 0.0, sim_mass = 0.0;
    bool any_valid = false, any_rated = false;
    for (int32_t j = 0; j < k_sim; ++j) {
      const int32_t nb = sim_ids[(int64_t)center * k_sim + j];
      if (nb < 0) continue;
      const float s = sim_vals[(int64_t)center * k_sim + j];
      any_valid = true;
      sim_mass += std::fabs(s);
      bool found = false;
      const float r = cf_mode == 0
          ? row_lookup(inter_indptr, inter_indices, inter_data, nb, i, &found)
          : row_lookup(inter_indptr, inter_indices, inter_data, u, nb, &found);
      if (found && r != 0.0f) {
        any_rated = true;
        num += (double)s * (double)r;
        den_abs += std::fabs((double)s);
        rated_signed += (double)s;
      }
    }
    if (!any_valid || !any_rated) {
      out[q] = default_pred;
    } else if (task_rating) {
      out[q] = (float)(num / std::max(den_abs, 1e-10));
    } else {
      // ranking: fraction of neighbor similarity mass that consumed i
      out[q] = (float)(rated_signed / std::max(sim_mass, 1e-10));
    }
  }
}

}  // extern "C"
