// Per-DFA-state allowed-token bitmask projection.
//
// C++ counterpart of the reference's xgrammar token-mask kernels
// (sgl-kernel `apply_token_bitmask` feeds masks that xgrammar's C++ core
// computes): given a dense byte-transition table of a materialized DFA
// and a flattened token byte-trie, compute the packed uint32 allowed-token
// bitmask of EVERY state in one pass.
//
// The Python fallback (`TokenVocab.compute_mask`) walks the trie per state
// in pure Python — minutes for a 150k vocab x 1k states grammar compile;
// this does the same walk in native code (shared trie prefixes prune once,
// DFS carries the DFA state).
//
// Trie encoding (built once per vocabulary):
//   nodes 0..N-1, 0 = root
//   edges of node i: indices [edge_start[i], edge_start[i+1])
//     edge_byte[e]   -- byte label
//     edge_target[e] -- child node id
//   tokens at node i: tok_ids[tok_start[i] : tok_start[i+1]]
//
// Exposed through a plain C ABI (ctypes; no pybind11 in the image).

#include <cstdint>
#include <vector>

extern "C" {

// byte_table: [S, 256] int32, dead transition = -1
// accepting:  [S] uint8 (EOS allowed iff accepting)
// out:        [S, nwords] uint32, zero-initialized by the caller
void compute_state_masks(
    const int32_t* byte_table, int32_t S,
    const uint8_t* accepting,
    const int32_t* edge_start, const int32_t* edge_byte,
    const int32_t* edge_target, int32_t n_nodes,
    const int32_t* tok_start, const int32_t* tok_ids,
    uint32_t* out, int32_t nwords, int32_t eos_token) {
  std::vector<int64_t> stack;  // packed (node << 20) | dfa_state
  stack.reserve(1024);
  for (int32_t s = 0; s < S; s++) {
    uint32_t* mask = out + (int64_t)s * nwords;
    if (accepting[s] && eos_token >= 0) {
      mask[eos_token >> 5] |= (uint32_t)1 << (eos_token & 31);
    }
    stack.clear();
    stack.push_back(((int64_t)0 << 20) | s);
    while (!stack.empty()) {
      int64_t packed = stack.back();
      stack.pop_back();
      int32_t node = (int32_t)(packed >> 20);
      int32_t st = (int32_t)(packed & 0xFFFFF);
      // tokens ending at this node are allowed (all bytes kept the DFA
      // alive on the way down)
      for (int32_t t = tok_start[node]; t < tok_start[node + 1]; t++) {
        int32_t tid = tok_ids[t];
        mask[tid >> 5] |= (uint32_t)1 << (tid & 31);
      }
      const int32_t* row = byte_table + (int64_t)st * 256;
      for (int32_t e = edge_start[node]; e < edge_start[node + 1]; e++) {
        int32_t nxt = row[edge_byte[e]];
        if (nxt >= 0) {
          stack.push_back(((int64_t)edge_target[e] << 20) | nxt);
        }
      }
    }
  }
}

}  // extern "C"
