// Token-closure walk for grammar-constrained decoding.
//
// Computes, for every (DFA state, vocabulary token) pair, whether the
// token's character walk survives the grammar, and packs the result as
// LSB-first uint32 bitmasks — the host-side build step behind
// cadence_gemma_tpu/inference/constrain.py (see TokenDFA.__init__ for the
// numpy fallback with identical semantics). The walk is embarrassingly
// parallel over DFA states; each thread owns a contiguous state range so
// output rows never contend.
//
// Performance notes:
//   * tokens are pre-deduplicated by atom string in Python (unique rows
//     only reach this function); the walk early-exits on the absorbing
//     dead state, which most real-vocabulary tokens hit within a couple
//     of characters;
//   * the per-state unique-token liveness vector lives on the stack of
//     each thread (U bytes), and the V-wide scatter writes bits straight
//     into the caller's output buffer.

#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// trans: [S, A] int32 char-DFA transitions (row `dead` is absorbing).
// u_cols: [U, L] int32 atom ids per unique token (slots past a token's
//   length may hold anything — u_len bounds the walk).
// u_len: [U] int32 lengths; length 0 = never allowed (empty/dead rows).
// uid: [V] int32 token id -> unique row.
// out_bits: [S, W] uint32, W = ceil(V/32), pre-zeroed by the caller.
// Returns 0 on success.
int constrain_walk_pack(const int32_t* trans, int32_t n_states,
                        int32_t n_atoms, const int32_t* u_cols,
                        int32_t n_uniq, int32_t max_len,
                        const int32_t* u_len, const int32_t* uid,
                        int32_t vocab, int32_t dead, uint32_t* out_bits,
                        int32_t n_threads) {
  if (n_states <= 0 || vocab <= 0) return 0;
  const int32_t n_words = (vocab + 31) / 32;
  if (n_threads <= 0) {
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n_states) n_threads = n_states;

  std::atomic<int32_t> next_state{0};
  auto worker = [&]() {
    std::vector<uint8_t> live(static_cast<size_t>(n_uniq));
    for (;;) {
      const int32_t s = next_state.fetch_add(1);
      if (s >= n_states) return;
      for (int32_t u = 0; u < n_uniq; ++u) {
        const int32_t len = u_len[u];
        if (len <= 0) {
          live[u] = 0;
          continue;
        }
        int32_t cur = s;
        const int32_t* cols = u_cols + static_cast<int64_t>(u) * max_len;
        for (int32_t j = 0; j < len; ++j) {
          cur = trans[static_cast<int64_t>(cur) * n_atoms + cols[j]];
          if (cur == dead) break;  // absorbing
        }
        live[u] = cur != dead;
      }
      uint32_t* row = out_bits + static_cast<int64_t>(s) * n_words;
      for (int32_t v = 0; v < vocab; ++v) {
        row[v >> 5] |=
            static_cast<uint32_t>(live[uid[v]]) << (v & 31);
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(n_threads));
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
