// Native CTC prefix beam search — the host-side decode hot loop of the
// serving path (ops/beam.py has the reference Python implementation; this
// is semantics-identical and ~2 orders of magnitude faster, verified in
// tests/test_beam.py::test_native_matches_python).
//
// Prefixes are stored in a parent-pointer trie (arena); each frame expands
// the live beam over the pruned emission set, merging paths per prefix in
// the (log) blank/non-blank split, with optional bigram-LM shallow fusion
// (row V of the (V+1)xV matrix is the sentence-start context).
//
// Build: make -C native (produces libdacsbeam.so, ctypes-bound by
// privacy_preserve_federated_asr_tpu/ops/beam.py with graceful fallback).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

inline float lse(float a, float b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  float m = a > b ? a : b;
  return m + std::log1p(std::exp(-(a > b ? a - b : b - a)));
}

struct TrieNode {
  int32_t parent;  // -1 for root
  int32_t tok;     // -1 for root
};

struct BeamVal {
  float pb;   // log P(prefix, last frame blank)
  float pnb;  // log P(prefix, last frame non-blank)
  float lm;   // accumulated LM component
};

}  // namespace

extern "C" long dacs_ctc_beam_search(
    const float* log_probs, long T, long V, long beam_size, long blank_id,
    const float* lm, float lm_alpha, float lm_beta, float prune,
    int32_t* out_ids, long max_out, float* out_score) {
  if (T < 0 || V <= 0 || beam_size <= 0 || blank_id < 0 || blank_id >= V)
    return -1;

  std::vector<TrieNode> trie;
  trie.push_back({-1, -1});  // root = prefix ()
  // per-frame child lookup: (node << 32 | tok) -> child node id
  std::unordered_map<uint64_t, int32_t> children;

  std::unordered_map<int32_t, BeamVal> beams;
  beams[0] = {0.0f, kNegInf, 0.0f};

  std::vector<long> keep;
  keep.reserve(V);
  std::unordered_map<int32_t, BeamVal> next;
  std::vector<std::pair<float, int32_t>> order;

  auto child_of = [&](int32_t node, long v) -> int32_t {
    uint64_t key = (static_cast<uint64_t>(node) << 32) |
                   static_cast<uint64_t>(v);
    auto it = children.find(key);
    if (it != children.end()) return it->second;
    int32_t id = static_cast<int32_t>(trie.size());
    trie.push_back({node, static_cast<int32_t>(v)});
    children.emplace(key, id);
    return id;
  };

  auto add = [&](int32_t node, float pb, float pnb, float lmv) {
    auto it = next.find(node);
    if (it == next.end()) {
      next.emplace(node, BeamVal{pb, pnb, lmv});
    } else {
      it->second.pb = lse(it->second.pb, pb);
      it->second.pnb = lse(it->second.pnb, pnb);
      it->second.lm = lmv;  // function of the prefix alone
    }
  };

  for (long t = 0; t < T; ++t) {
    const float* frame = log_probs + t * V;
    float fmax = kNegInf;
    for (long v = 0; v < V; ++v) fmax = std::max(fmax, frame[v]);
    keep.clear();
    for (long v = 0; v < V; ++v)
      if (frame[v] >= fmax + prune) keep.push_back(v);

    next.clear();
    for (const auto& kv : beams) {
      const int32_t node = kv.first;
      const BeamVal& b = kv.second;
      const float p_tot = lse(b.pb, b.pnb);
      const int32_t last = trie[node].tok;  // -1 at root
      const long ctx = last < 0 ? V : last; // LM context row
      for (long v : keep) {
        const float pv = frame[v];
        if (v == blank_id) {
          add(node, p_tot + pv, kNegInf, b.lm);
          continue;
        }
        float new_lm = b.lm;
        if (lm != nullptr)
          new_lm += lm_alpha * lm[ctx * V + v] + lm_beta;
        if (v == last) {
          add(node, kNegInf, b.pnb + pv, b.lm);          // stay (repeat)
          add(child_of(node, v), kNegInf, b.pb + pv, new_lm);
        } else {
          add(child_of(node, v), kNegInf, p_tot + pv, new_lm);
        }
      }
    }

    order.clear();
    for (const auto& kv : next) {
      const float tot = lse(kv.second.pb, kv.second.pnb);
      if (tot == kNegInf) continue;  // dead prefix
      order.emplace_back(-(tot + kv.second.lm), kv.first);
    }
    const size_t k = std::min<size_t>(beam_size, order.size());
    std::partial_sort(order.begin(), order.begin() + k, order.end());
    beams.clear();
    for (size_t i = 0; i < k; ++i) beams[order[i].second] = next[order[i].second];
    if (beams.empty()) beams[0] = {0.0f, kNegInf, 0.0f};  // degenerate input
  }

  // pick the best final prefix
  int32_t best = 0;
  float best_score = -std::numeric_limits<float>::infinity();
  for (const auto& kv : beams) {
    const float s = lse(kv.second.pb, kv.second.pnb) + kv.second.lm;
    if (s > best_score) {
      best_score = s;
      best = kv.first;
    }
  }
  if (out_score != nullptr) *out_score = best_score;

  // walk parents to emit ids in order
  std::vector<int32_t> rev;
  for (int32_t n = best; n > 0; n = trie[n].parent) rev.push_back(trie[n].tok);
  if (static_cast<long>(rev.size()) > max_out) return -2;
  for (size_t i = 0; i < rev.size(); ++i)
    out_ids[i] = rev[rev.size() - 1 - i];
  return static_cast<long>(rev.size());
}
