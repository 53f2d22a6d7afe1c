// graph_core: native host-side graph preprocessing for keras_geometric_tpu.
//
// The reference outsources all preprocessing to Python/numpy (it has no
// native code at all — SURVEY.md §2.3); at OGB scale (ogbn-products: 123M
// edges) the hot host paths are edge sorting / CSR construction and the
// per-node neighbor-sampling loop. This library implements them in C++:
//
//   - coo_to_csr: O(E) counting sort by receiver (stable), emitting the
//     permutation and row_ptr — replaces np.argsort (O(E log E)) and the
//     NeighborSampler CSC build.
//   - gcn_norm: in-degree + symmetric normalization weights in one pass.
//   - uniform_sample: per-seed uniform fanout sampling without replacement
//     (partial Fisher-Yates on an index window), replacing the Python
//     per-node loop in data/sampling.py.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// All arrays are caller-allocated; int64 for edge offsets (E can exceed
// 2^31 on products-scale graphs).

#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// Stable counting sort of edges by receiver.
// senders/receivers: [e] int32. Outputs: perm [e] int64 (sorted edge ->
// original id), row_ptr [n+1] int64.
void kgt_coo_to_csr(const int32_t* receivers, int64_t e, int64_t n,
                    int64_t* perm, int64_t* row_ptr) {
  std::vector<int64_t> count(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) count[receivers[i] + 1]++;
  for (int64_t r = 0; r < n; ++r) count[r + 1] += count[r];
  std::memcpy(row_ptr, count.data(), (n + 1) * sizeof(int64_t));
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t i = 0; i < e; ++i) {
    perm[cursor[receivers[i]]++] = i;
  }
}

// Symmetric GCN normalization weights: w_e = (d[r]+eps)^-1/2 (d[s]+eps)^-1/2
// with d = receiver in-degree (utils/main.py:22-33 semantics; inf -> 0).
void kgt_gcn_norm(const int32_t* senders, const int32_t* receivers,
                  int64_t e, int64_t n, float* out) {
  std::vector<double> deg(n, 0.0);
  for (int64_t i = 0; i < e; ++i) deg[receivers[i]] += 1.0;
  std::vector<double> inv(n);
  for (int64_t r = 0; r < n; ++r) {
    double v = 1.0 / std::sqrt(deg[r] + 1e-12);
    inv[r] = std::isinf(v) ? 0.0 : v;
  }
  for (int64_t i = 0; i < e; ++i) {
    out[i] = static_cast<float>(inv[receivers[i]] * inv[senders[i]]);
  }
}

// Uniform fanout sampling of in-neighbors for a batch of seeds.
// sorted_senders: [e] int32 (receiver-sorted), row_ptr: [n+1] int64.
// seeds: [b] int64. out: [b * fanout] int64, -1 padded.
// Sampling is without replacement when degree > fanout (partial
// Fisher-Yates over the neighbor window).
void kgt_uniform_sample(const int32_t* sorted_senders, const int64_t* row_ptr,
                        const int64_t* seeds, int64_t b, int64_t fanout,
                        uint64_t rng_seed, int64_t* out) {
  std::mt19937_64 rng(rng_seed);
  std::vector<int64_t> window;
  for (int64_t i = 0; i < b; ++i) {
    int64_t v = seeds[i];
    int64_t lo = row_ptr[v], hi = row_ptr[v + 1];
    int64_t deg = hi - lo;
    int64_t* dst = out + i * fanout;
    if (deg <= fanout) {
      int64_t k = 0;
      for (int64_t j = lo; j < hi; ++j) dst[k++] = sorted_senders[j];
      for (; k < fanout; ++k) dst[k] = -1;
    } else {
      window.resize(deg);
      for (int64_t j = 0; j < deg; ++j) window[j] = j;
      for (int64_t k = 0; k < fanout; ++k) {
        std::uniform_int_distribution<int64_t> dist(k, deg - 1);
        int64_t j = dist(rng);
        std::swap(window[k], window[j]);
        dst[k] = sorted_senders[lo + window[k]];
      }
    }
  }
}

// Degree histogram (receiver in-degree), useful for partition balancing.
void kgt_in_degree(const int32_t* receivers, int64_t e, int64_t n,
                   int64_t* out) {
  std::memset(out, 0, n * sizeof(int64_t));
  for (int64_t i = 0; i < e; ++i) out[receivers[i]]++;
}

}  // extern "C"
