// Reference-class CPU HNSW baseline (measurement tool, not product code).
//
// BASELINE.md's north star compares TPU QPS/chip against "reference CPU
// HNSW throughput at recall@10 >= 0.95" with the reference's defaults
// (m=16, ef_construction=128 — /root/reference/helix-cli/src/config.rs:191-201).
// The reference engine itself is a closed container image that cannot run
// here, so this is a faithful single-node HNSW (Malkov & Yashunin 2016,
// standard algorithm: greedy descent on upper layers, ef-bounded
// best-first search per layer, heuristic neighbor selection) compiled
// with the same toolchain flags as the rest of the native tree, measured
// on the same corpus bench.py serves from the TPU.
//
// Cosine metric over pre-normalized vectors (distance = 1 - dot).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

static inline float dot(const float* a, const float* b, int d) {
  float s = 0.f;
  for (int i = 0; i < d; i++) s += a[i] * b[i];
  return s;
}

struct Hnsw {
  int d = 0;
  int M = 16;
  int M0 = 32;
  int efc = 128;
  int64_t max_n = 0;
  int64_t n = 0;
  int max_level = -1;
  int64_t entry = -1;
  double level_mult = 0.0;

  std::vector<float> data;        // [max_n * d]
  std::vector<int> levels;        // [max_n]
  std::vector<int> l0_links;      // [max_n * (M0 + 1)]: count + slots
  // upper layers: per node with level >= 1, a block of level*(M+1) ints
  std::vector<int64_t> upper_off;  // [max_n] offset into upper, -1 if none
  std::vector<int> upper;

  // visited epochs (single-threaded build/search)
  std::vector<int> visited;
  int epoch = 0;

  std::mt19937 rng{12345};

  int* links(int64_t node, int layer) {
    if (layer == 0) return &l0_links[node * (M0 + 1)];
    return &upper[upper_off[node] + (int64_t)(layer - 1) * (M + 1)];
  }

  float dist(const float* q, int64_t node) const {
    return 1.f - dot(q, &data[node * d], d);
  }

  int random_level() {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double r = u(rng);
    int lvl = (int)(-std::log(std::max(r, 1e-12)) * level_mult);
    return lvl;
  }

  void next_epoch() {
    if (++epoch == INT32_MAX) {
      std::fill(visited.begin(), visited.end(), 0);
      epoch = 1;
    }
  }

  // ef-bounded best-first search on one layer.  Returns candidates as
  // (dist, id) pairs, NOT sorted.
  void search_layer(const float* q, int64_t ep, float ep_d, int ef,
                    int layer,
                    std::vector<std::pair<float, int64_t>>& out) {
    next_epoch();
    // min-heap of candidates to expand; max-heap of current best ef
    std::priority_queue<std::pair<float, int64_t>,
                        std::vector<std::pair<float, int64_t>>,
                        std::greater<>> cand;
    std::priority_queue<std::pair<float, int64_t>> best;
    cand.emplace(ep_d, ep);
    best.emplace(ep_d, ep);
    visited[ep] = epoch;
    while (!cand.empty()) {
      auto [cd, c] = cand.top();
      if (cd > best.top().first && (int64_t)best.size() >= ef) break;
      cand.pop();
      const int* lk = links(c, layer);
      int cnt = lk[0];
      for (int i = 1; i <= cnt; i++) {
        int64_t nb = lk[i];
        if (visited[nb] == epoch) continue;
        visited[nb] = epoch;
        float nd = dist(q, nb);
        if ((int64_t)best.size() < ef || nd < best.top().first) {
          cand.emplace(nd, nb);
          best.emplace(nd, nb);
          if ((int64_t)best.size() > ef) best.pop();
        }
      }
    }
    out.clear();
    while (!best.empty()) { out.push_back(best.top()); best.pop(); }
  }

  // Heuristic neighbor selection (paper Alg. 4, keepPruned like
  // hnswlib): keep a candidate only if it is closer to q than to every
  // already-kept neighbor; backfill with pruned ones if short.
  void select_neighbors(const float* q,
                        std::vector<std::pair<float, int64_t>>& cand,
                        int m, std::vector<int64_t>& out) {
    std::sort(cand.begin(), cand.end());
    out.clear();
    std::vector<std::pair<float, int64_t>> pruned;
    for (auto& [cd, c] : cand) {
      if ((int)out.size() >= m) break;
      bool keep = true;
      const float* cv = &data[c * d];
      for (int64_t kept : out) {
        float d_ck = 1.f - dot(cv, &data[kept * d], d);
        if (d_ck < cd) { keep = false; break; }
      }
      if (keep) out.push_back(c);
      else pruned.emplace_back(cd, c);
    }
    for (auto& [pd, p] : pruned) {
      if ((int)out.size() >= m) break;
      out.push_back(p);
    }
  }

  void connect(int64_t node, int64_t nb, int layer) {
    int cap = layer == 0 ? M0 : M;
    int* lk = links(nb, layer);
    if (lk[0] < cap) {
      lk[++lk[0]] = (int)node;
      return;
    }
    // full: re-select among existing + new by the heuristic
    const float* nv = &data[nb * d];
    std::vector<std::pair<float, int64_t>> cand;
    cand.reserve(cap + 1);
    cand.emplace_back(1.f - dot(nv, &data[node * d], d), node);
    for (int i = 1; i <= lk[0]; i++)
      cand.emplace_back(1.f - dot(nv, &data[lk[i] * d], d), lk[i]);
    std::vector<int64_t> sel;
    select_neighbors(nv, cand, cap, sel);
    lk[0] = (int)sel.size();
    for (size_t i = 0; i < sel.size(); i++) lk[i + 1] = (int)sel[i];
  }

  void insert(const float* v) {
    int64_t node = n++;
    std::memcpy(&data[node * d], v, sizeof(float) * d);
    int lvl = random_level();
    levels[node] = lvl;
    l0_links[node * (M0 + 1)] = 0;
    if (lvl >= 1) {
      upper_off[node] = (int64_t)upper.size();
      upper.resize(upper.size() + (size_t)lvl * (M + 1), 0);
    } else {
      upper_off[node] = -1;
    }
    if (entry < 0) {
      entry = node;
      max_level = lvl;
      return;
    }
    int64_t ep = entry;
    float ep_d = dist(v, ep);
    // greedy descent above the node's level
    for (int layer = max_level; layer > lvl; layer--) {
      bool moved = true;
      while (moved) {
        moved = false;
        const int* lk = links(ep, layer);
        for (int i = 1; i <= lk[0]; i++) {
          float nd = dist(v, lk[i]);
          if (nd < ep_d) { ep_d = nd; ep = lk[i]; moved = true; }
        }
      }
    }
    std::vector<std::pair<float, int64_t>> cand;
    std::vector<int64_t> sel;
    for (int layer = std::min(lvl, max_level); layer >= 0; layer--) {
      search_layer(v, ep, ep_d, efc, layer, cand);
      int m = layer == 0 ? M0 : M;
      select_neighbors(v, cand, m, sel);
      int* lk = links(node, layer);
      lk[0] = (int)sel.size();
      for (size_t i = 0; i < sel.size(); i++) lk[i + 1] = (int)sel[i];
      for (int64_t nb : sel) connect(node, nb, layer);
      // best candidate seeds the next layer down
      ep = sel.empty() ? ep : sel[0];
      ep_d = dist(v, ep);
    }
    if (lvl > max_level) {
      max_level = lvl;
      entry = node;
    }
  }

  void search(const float* q, int k, int ef, int64_t* out_ids,
              float* out_d) {
    if (n == 0) {
      for (int i = 0; i < k; i++) { out_ids[i] = -1; out_d[i] = 3.4e38f; }
      return;
    }
    int64_t ep = entry;
    float ep_d = dist(q, ep);
    for (int layer = max_level; layer >= 1; layer--) {
      bool moved = true;
      while (moved) {
        moved = false;
        const int* lk = links(ep, layer);
        for (int i = 1; i <= lk[0]; i++) {
          float nd = dist(q, lk[i]);
          if (nd < ep_d) { ep_d = nd; ep = lk[i]; moved = true; }
        }
      }
    }
    std::vector<std::pair<float, int64_t>> cand;
    search_layer(q, ep, ep_d, std::max(ef, k), 0, cand);
    std::sort(cand.begin(), cand.end());
    for (int i = 0; i < k; i++) {
      if (i < (int)cand.size()) {
        out_d[i] = cand[i].first;
        out_ids[i] = cand[i].second;
      } else {
        out_d[i] = 3.4e38f;
        out_ids[i] = -1;
      }
    }
  }
};

}  // namespace

extern "C" {

void* hxhnsw_create(int d, int64_t max_n, int M, int efc, unsigned seed) {
  auto* h = new Hnsw();
  h->d = d;
  h->M = M;
  h->M0 = 2 * M;
  h->efc = efc;
  h->max_n = max_n;
  h->level_mult = 1.0 / std::log((double)M);
  h->rng.seed(seed);
  h->data.resize((size_t)max_n * d);
  h->levels.assign(max_n, 0);
  h->l0_links.assign((size_t)max_n * (h->M0 + 1), 0);
  h->upper_off.assign(max_n, -1);
  h->visited.assign(max_n, 0);
  return h;
}

void hxhnsw_free(void* p) { delete (Hnsw*)p; }

int64_t hxhnsw_size(void* p) { return ((Hnsw*)p)->n; }

// Sequential bulk insert; returns count inserted.
int64_t hxhnsw_add(void* p, const float* vecs, int64_t count) {
  auto* h = (Hnsw*)p;
  int64_t added = 0;
  for (int64_t i = 0; i < count && h->n < h->max_n; i++, added++)
    h->insert(vecs + i * h->d);
  return added;
}

void hxhnsw_search(void* p, const float* queries, int64_t nq, int k,
                   int ef, int64_t* out_ids, float* out_d) {
  auto* h = (Hnsw*)p;
  for (int64_t i = 0; i < nq; i++)
    h->search(queries + i * h->d, k, ef, out_ids + (int64_t)i * k,
              out_d + (int64_t)i * k);
}

int hxhnsw_save(void* p, const char* path) {
  auto* h = (Hnsw*)p;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int64_t header[8] = {0x48585357, h->d, h->M, h->efc, h->n,
                       h->max_level, h->entry, (int64_t)h->upper.size()};
  std::fwrite(header, sizeof(header), 1, f);
  std::fwrite(h->levels.data(), sizeof(int), h->n, f);
  std::fwrite(h->l0_links.data(), sizeof(int), (size_t)h->n * (h->M0 + 1), f);
  std::fwrite(h->upper_off.data(), sizeof(int64_t), h->n, f);
  std::fwrite(h->upper.data(), sizeof(int), h->upper.size(), f);
  std::fwrite(h->data.data(), sizeof(float), (size_t)h->n * h->d, f);
  std::fclose(f);
  return 0;
}

void* hxhnsw_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  int64_t header[8];
  if (std::fread(header, sizeof(header), 1, f) != 1 ||
      header[0] != 0x48585357) {
    std::fclose(f);
    return nullptr;
  }
  auto* h = (Hnsw*)hxhnsw_create((int)header[1], header[4], (int)header[2],
                                 (int)header[3], 12345);
  h->n = header[4];
  h->max_level = (int)header[5];
  h->entry = header[6];
  h->upper.resize((size_t)header[7]);
  size_t ok = 1;
  ok &= std::fread(h->levels.data(), sizeof(int), h->n, f) == (size_t)h->n;
  ok &= std::fread(h->l0_links.data(), sizeof(int),
                   (size_t)h->n * (h->M0 + 1), f) ==
        (size_t)h->n * (h->M0 + 1);
  ok &= std::fread(h->upper_off.data(), sizeof(int64_t), h->n, f) ==
        (size_t)h->n;
  ok &= std::fread(h->upper.data(), sizeof(int), h->upper.size(), f) ==
        h->upper.size();
  ok &= std::fread(h->data.data(), sizeof(float), (size_t)h->n * h->d, f) ==
        (size_t)h->n * h->d;
  std::fclose(f);
  if (!ok) { hxhnsw_free(h); return nullptr; }
  return h;
}

}  // extern "C"
