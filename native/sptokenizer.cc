// SentencePiece-compatible segmentation (the hot encode loop).
//
// The reference delegates tokenization to the sentencepiece C++ extension
// (reference pyproject.toml:28); this is the framework's native equivalent,
// driven through ctypes by cadence_gemma_tpu/utils/sp_cpp.py. It covers the
// post-normalization pipeline only (normalization is cheap string work and
// stays in Python): USER_DEFINED leftmost-longest pre-split, unigram Viterbi
// or BPE agenda merge, consecutive-unknown fusing, and byte fallback. The
// Python implementation in cadence_gemma_tpu/sp_native.py is the semantic
// reference; the two are equality-tested on random models and inputs.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kNormal = 1;
constexpr int kUserDefined = 4;
constexpr int kByte = 6;
constexpr int kUnigram = 1;
constexpr int kBpe = 2;

inline int Utf8CharLen(uint8_t b) {
  if (b < 0x80) return 1;
  if (b >= 0xF0) return 4;
  if (b >= 0xE0) return 3;
  if (b >= 0xC0) return 2;
  return 1;  // continuation/invalid byte: single unit (matches Python)
}

struct TrieNode {
  int32_t terminal = -1;  // piece id ending here, or -1
  // Sorted (byte, child index) pairs; binary searched.
  std::vector<std::pair<uint8_t, int32_t>> children;
};

class Trie {
 public:
  Trie() { nodes_.emplace_back(); }

  void Add(const uint8_t* key, int64_t len, int32_t value) {
    int32_t node = 0;
    for (int64_t i = 0; i < len; ++i) {
      node = Child(node, key[i], /*create=*/true);
    }
    nodes_[node].terminal = value;
  }

  // Appends (end_offset_from_pos, piece_id) matches, shortest first.
  void Matches(const uint8_t* data, int64_t pos, int64_t len,
               std::vector<std::pair<int64_t, int32_t>>* out) const {
    int32_t node = 0;
    for (int64_t i = pos; i < len; ++i) {
      node = Child(node, data[i], /*create=*/false);
      if (node < 0) return;
      if (nodes_[node].terminal >= 0) {
        out->emplace_back(i + 1, nodes_[node].terminal);
      }
    }
  }

  bool empty() const { return nodes_.size() == 1 && nodes_[0].terminal < 0; }

 private:
  int32_t Child(int32_t node, uint8_t b, bool create) {
    auto& ch = nodes_[node].children;
    auto it = std::lower_bound(
        ch.begin(), ch.end(), b,
        [](const std::pair<uint8_t, int32_t>& p, uint8_t v) {
          return p.first < v;
        });
    if (it != ch.end() && it->first == b) return it->second;
    if (!create) return -1;
    int32_t idx = static_cast<int32_t>(nodes_.size());
    nodes_.emplace_back();
    nodes_[node].children.insert(
        nodes_[node].children.begin() + (it - nodes_[node].children.begin()),
        {b, idx});
    return idx;
  }

  int32_t Child(int32_t node, uint8_t b, bool create) const {
    return const_cast<Trie*>(this)->Child(node, b, create);
  }

  std::vector<TrieNode> nodes_;
};

struct Model {
  int32_t model_type = kUnigram;
  int32_t unk_id = 0;
  bool byte_fallback = false;
  double unk_score = 0.0;
  std::vector<float> scores;
  std::vector<int32_t> types;
  Trie trie;     // NORMAL + USER_DEFINED pieces
  Trie ud_trie;  // USER_DEFINED only (pre-split scan)
  std::unordered_map<std::string, int32_t> piece_to_id;  // NORMAL + UD
  int32_t byte_ids[256];
};

class Encoder {
 public:
  Encoder(const Model& m, const uint8_t* data, int64_t len,
          std::vector<int32_t>* out)
      : m_(m), data_(data), len_(len), out_(out) {}

  void Run() {
    if (m_.ud_trie.empty()) {
      Segment(0, len_);
      return;
    }
    std::vector<std::pair<int64_t, int32_t>> hits;
    int64_t i = 0, seg_start = 0;
    while (i < len_) {
      hits.clear();
      m_.ud_trie.Matches(data_, i, len_, &hits);
      if (!hits.empty()) {
        if (seg_start < i) Segment(seg_start, i);
        out_->push_back(hits.back().second);  // longest match
        i = hits.back().first;
        seg_start = i;
      } else {
        i += Utf8CharLen(data_[i]);
      }
    }
    if (seg_start < len_) Segment(seg_start, len_);
  }

 private:
  void EmitUnknown(int64_t start, int64_t end) {
    if (m_.byte_fallback) {
      for (int64_t i = start; i < end; ++i) {
        int32_t bid = m_.byte_ids[data_[i]];
        out_->push_back(bid >= 0 ? bid : m_.unk_id);
      }
    } else {
      out_->push_back(m_.unk_id);
    }
  }

  void Segment(int64_t start, int64_t end) {
    if (m_.model_type == kBpe) {
      SegmentBpe(start, end);
    } else {
      SegmentUnigram(start, end);
    }
  }

  void SegmentUnigram(int64_t start, int64_t end) {
    const int64_t n = end - start;
    constexpr double kNegInf = -std::numeric_limits<double>::infinity();
    std::vector<double> best(n + 1, kNegInf);
    // back[e] = (start_offset, piece id or -1 for unk)
    std::vector<std::pair<int64_t, int32_t>> back(n + 1, {-1, -1});
    best[0] = 0.0;
    std::vector<std::pair<int64_t, int32_t>> hits;
    int64_t i = 0;
    while (i < n) {
      if (best[i] != kNegInf) {
        const double base = best[i];
        hits.clear();
        m_.trie.Matches(data_, start + i, end, &hits);
        for (const auto& h : hits) {
          const int64_t e = h.first - start;
          const double cand = base + static_cast<double>(m_.scores[h.second]);
          if (cand > best[e]) {
            best[e] = cand;
            back[e] = {i, h.second};
          }
        }
        const int64_t e =
            std::min<int64_t>(i + Utf8CharLen(data_[start + i]), n);
        const double cand = base + m_.unk_score;
        if (cand > best[e]) {
          best[e] = cand;
          back[e] = {i, -1};
        }
      }
      i += Utf8CharLen(data_[start + i]);
    }
    // Backtrack, then emit with consecutive unknowns fused.
    std::vector<std::pair<int64_t, int32_t>> tokens;  // (start_offset, pid)
    std::vector<int64_t> ends;
    int64_t pos = n;
    while (pos > 0) {
      const auto& b = back[pos];
      tokens.emplace_back(b.first, b.second);
      ends.push_back(pos);
      pos = b.first;
    }
    std::reverse(tokens.begin(), tokens.end());
    std::reverse(ends.begin(), ends.end());
    size_t k = 0;
    while (k < tokens.size()) {
      if (tokens[k].second >= 0) {
        out_->push_back(tokens[k].second);
        ++k;
        continue;
      }
      size_t j = k;
      while (j + 1 < tokens.size() && tokens[j + 1].second < 0) ++j;
      EmitUnknown(start + tokens[k].first, start + ends[j]);
      k = j + 1;
    }
  }

  void SegmentBpe(int64_t start, int64_t end) {
    // Symbols as byte spans over data_[start:end), linked by index.
    std::vector<int64_t> s_begin, s_end;
    for (int64_t i = start; i < end;) {
      s_begin.push_back(i);
      i += Utf8CharLen(data_[i]);
      s_end.push_back(std::min(i, end));
    }
    const int64_t n = static_cast<int64_t>(s_begin.size());
    std::vector<int64_t> left(n), right(n);
    std::vector<char> alive(n, 1);
    for (int64_t k = 0; k < n; ++k) {
      left[k] = k - 1;
      right[k] = k + 1;
    }
    // Heap entries mirror the Python tuple
    // (-score, left_byte_start, a, b, b_end): pop the smallest.
    struct Entry {
      double neg_score;
      int64_t left_start;
      int64_t a, b, b_end;
      bool operator>(const Entry& o) const {
        if (neg_score != o.neg_score) return neg_score > o.neg_score;
        if (left_start != o.left_start) return left_start > o.left_start;
        if (a != o.a) return a > o.a;
        if (b != o.b) return b > o.b;
        return b_end > o.b_end;
      }
    };
    std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
    std::string scratch;
    auto push = [&](int64_t a, int64_t b) {
      scratch.assign(reinterpret_cast<const char*>(data_) + s_begin[a],
                     s_end[b] - s_begin[a]);
      auto it = m_.piece_to_id.find(scratch);
      if (it != m_.piece_to_id.end() && m_.types[it->second] == kNormal) {
        heap.push({-static_cast<double>(m_.scores[it->second]), s_begin[a], a,
                   b, s_end[b]});
      }
    };
    for (int64_t k = 0; k + 1 < n; ++k) push(k, k + 1);
    while (!heap.empty()) {
      Entry e = heap.top();
      heap.pop();
      if (!alive[e.a] || !alive[e.b]) continue;
      if (right[e.a] != e.b || s_end[e.b] != e.b_end) continue;  // stale
      s_end[e.a] = s_end[e.b];
      alive[e.b] = 0;
      right[e.a] = right[e.b];
      if (right[e.b] < n) left[right[e.b]] = e.a;
      if (left[e.a] >= 0) push(left[e.a], e.a);
      if (right[e.a] < n) push(e.a, right[e.a]);
    }
    // Map survivors; consecutive unknowns fuse.
    struct Sym {
      int64_t s, e;
      int32_t pid;  // -1 = unknown
    };
    std::vector<Sym> syms;
    for (int64_t k = 0; k < n; ++k) {
      if (!alive[k]) continue;
      scratch.assign(reinterpret_cast<const char*>(data_) + s_begin[k],
                     s_end[k] - s_begin[k]);
      auto it = m_.piece_to_id.find(scratch);
      syms.push_back({s_begin[k], s_end[k],
                      it == m_.piece_to_id.end() ? -1 : it->second});
    }
    size_t i = 0;
    while (i < syms.size()) {
      if (syms[i].pid >= 0) {
        out_->push_back(syms[i].pid);
        ++i;
        continue;
      }
      size_t j = i;
      while (j + 1 < syms.size() && syms[j + 1].pid < 0) ++j;
      EmitUnknown(syms[i].s, syms[j].e);
      i = j + 1;
    }
  }

  const Model& m_;
  const uint8_t* data_;
  int64_t len_;
  std::vector<int32_t>* out_;
};

}  // namespace

extern "C" {

void* sp_build(const uint8_t* pieces, const int64_t* offsets,
               const float* scores, const int32_t* types, int32_t n,
               int32_t model_type, int32_t unk_id, int32_t byte_fallback,
               double unk_score) {
  Model* m = new Model();
  m->model_type = model_type;
  m->unk_id = unk_id;
  m->byte_fallback = byte_fallback != 0;
  m->unk_score = unk_score;
  m->scores.assign(scores, scores + n);
  m->types.assign(types, types + n);
  std::fill(std::begin(m->byte_ids), std::end(m->byte_ids), -1);
  for (int32_t i = 0; i < n; ++i) {
    const uint8_t* key = pieces + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    if (types[i] == kNormal || types[i] == kUserDefined) {
      m->trie.Add(key, len, i);
      m->piece_to_id.emplace(
          std::string(reinterpret_cast<const char*>(key), len), i);
      if (types[i] == kUserDefined) m->ud_trie.Add(key, len, i);
    } else if (types[i] == kByte && len == 6) {
      // "<0xXX>"
      auto hex = [](uint8_t c) -> int {
        if (c >= '0' && c <= '9') return c - '0';
        if (c >= 'A' && c <= 'F') return c - 'A' + 10;
        if (c >= 'a' && c <= 'f') return c - 'a' + 10;
        return -1;
      };
      const int hi = hex(key[3]), lo = hex(key[4]);
      if (hi >= 0 && lo >= 0) m->byte_ids[hi * 16 + lo] = i;
    }
  }
  return m;
}

void sp_free(void* handle) { delete static_cast<Model*>(handle); }

int64_t sp_encode(void* handle, const uint8_t* text, int64_t len,
                  int32_t* out, int64_t max_out) {
  const Model* m = static_cast<const Model*>(handle);
  std::vector<int32_t> ids;
  ids.reserve(len / 2 + 8);
  Encoder(*m, text, len, &ids).Run();
  if (static_cast<int64_t>(ids.size()) > max_out) return -1;
  std::memcpy(out, ids.data(), ids.size() * sizeof(int32_t));
  return static_cast<int64_t>(ids.size());
}

}  // extern "C"
