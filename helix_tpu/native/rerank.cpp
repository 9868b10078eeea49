// Exact candidate re-ranking on the host-resident float32 matrix.
//
// The TPU scan phase returns approximate top-k' candidates (bfloat16
// matmul + approx_max_k); this re-scores just those rows in float32 and
// emits the exact final top-k per query.  At k'<=256 rows per query this
// is a few MFLOPs — microseconds on the host — and avoids a pathological
// device gather.  Compiled with -O3 -march=native so the inner dot
// vectorizes.
//
// C ABI only (loaded via ctypes).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

inline float dot(const float* a, const float* b, int64_t d) {
  float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
  int64_t i = 0;
  for (; i + 4 <= d; i += 4) {
    acc0 += a[i] * b[i];
    acc1 += a[i + 1] * b[i + 1];
    acc2 += a[i + 2] * b[i + 2];
    acc3 += a[i + 3] * b[i + 3];
  }
  float acc = acc0 + acc1 + acc2 + acc3;
  for (; i < d; i++) acc += a[i] * b[i];
  return acc;
}

}  // namespace

extern "C" {

// Re-rank candidates for a query batch.
//
//   data      [n, d]  row-major float32 packed matrix
//   sq_norms  [n]     squared norms (used when metric_l2 != 0)
//   queries   [b, d]  float32 (pre-normalized for cosine)
//   cand      [b, kc] int64 candidate row indices (may repeat; -1 = pad)
//   out_idx   [b, k]  int64 final indices
//   out_dist  [b, k]  float32 final distances ascending
//                     (cosine: 1 - dot; l2: |x|^2 - 2x.q + |q|^2)
void hx_rerank(const float* data, const float* sq_norms, int64_t n, int64_t d,
               const float* queries, int64_t b,
               const int64_t* cand, int64_t kc,
               int64_t k, int metric_l2,
               int64_t* out_idx, float* out_dist) {
  std::vector<std::pair<float, int64_t>> scored;
  scored.reserve(kc);
  for (int64_t qi = 0; qi < b; qi++) {
    const float* q = queries + qi * d;
    float q_sq = metric_l2 ? dot(q, q, d) : 0.f;
    scored.clear();
    for (int64_t ci = 0; ci < kc; ci++) {
      int64_t row = cand[qi * kc + ci];
      if (row < 0 || row >= n) continue;
      float s = dot(data + row * d, q, d);
      float dist = metric_l2 ? (sq_norms[row] - 2.f * s + q_sq) : (1.f - s);
      scored.emplace_back(dist, row);
    }
    int64_t keep = std::min<int64_t>(k, static_cast<int64_t>(scored.size()));
    std::partial_sort(scored.begin(), scored.begin() + keep, scored.end());
    for (int64_t j = 0; j < k; j++) {
      if (j < keep) {
        out_dist[qi * k + j] = scored[j].first;
        out_idx[qi * k + j] = scored[j].second;
      } else {
        out_dist[qi * k + j] = 3.4e38f;
        out_idx[qi * k + j] = -1;
      }
    }
  }
}

}  // extern "C"
