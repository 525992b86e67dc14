// Native Levenshtein distance — the TPU-framework counterpart of the
// reference's external C++ `editdistance` pip dependency (reference
// eval.py:168, tools/computer_wer.py:30). Tokens arrive as int32 ids
// (the Python wrapper interns arbitrary tokens); batch entry amortizes
// ctypes call overhead over a whole n-best list.
//
// Build: `make` in this directory (libedit_distance.so).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

int32_t edit_distance_i32(const int32_t* a, int32_t na,
                          const int32_t* b, int32_t nb) {
  if (na < nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  if (nb == 0) return na;
  std::vector<int32_t> prev(nb + 1), cur(nb + 1);
  for (int32_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int32_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const int32_t ca = a[i - 1];
    for (int32_t j = 1; j <= nb; ++j) {
      const int32_t sub = prev[j - 1] + (ca != b[j - 1]);
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Flattened batch: seqs = concatenated ids, lens[i] = length of sequence i.
// Computes distance(ref, hyp_i) for every hypothesis against one reference.
void edit_distance_nbest(const int32_t* ref, int32_t ref_len,
                         const int32_t* hyps, const int32_t* hyp_lens,
                         int32_t n_hyps, int32_t* out) {
  int64_t off = 0;
  for (int32_t i = 0; i < n_hyps; ++i) {
    out[i] = edit_distance_i32(ref, ref_len, hyps + off, hyp_lens[i]);
    off += hyp_lens[i];
  }
}

}  // extern "C"
