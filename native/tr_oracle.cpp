// tr_oracle: native golden model of group-wise term revealing.
//
// Role in the framework (SURVEY.md §4): the reference repo establishes
// correctness through redundant implementations (HESE exists 4x:
// tr_layer.py, bit_utils.py, the CUDA kernel, hese_encoder.v).  This
// library is the TPU framework's independent native twin — the same
// observable semantics as the reference CUDA kernel
// (kernels/tr_cuda_kernel.cu:15-125: MSB-down 3-bit-window HESE
// automaton + greedy k-way merge with lowest-index tie-break), written
// as portable C++ with no fixed MAX_TERMS/MAX_GROUP_SIZE capacity
// limits and defined behaviour for partial trailing groups.  Exposed
// with a C ABI for ctypes; used by the test suite to cross-check the
// JAX/Pallas implementations at scale (the pure-Python oracle is too
// slow beyond toy sizes).
//
// Build: make -C native   (produces native/build/libtr_oracle.so)

#include <cstdint>
#include <cstdlib>
#include <cmath>
#include <vector>

namespace {

// HESE-encode |value|/sf quantized to `bits`; append signed terms in
// decreasing magnitude order.  Mirrors the automaton cases:
//   (b2,b1,b0) = 011 -> +2^(i+1);  010 -> +2^i (skip below);  110 -> -2^i.
void hese_encode(float value, float sf, int bits,
                 std::vector<int64_t>& terms) {
  const int64_t maxq = (int64_t(1) << bits) - 1;
  int64_t q = static_cast<int64_t>(std::fabs(value) / sf + 0.5f);
  if (q > maxq) q = maxq;
  const int64_t sign = value < 0.0f ? -1 : 1;
  int i = 0;
  for (int64_t t = q; t; t >>= 1) ++i;  // bit_length
  for (; i >= 0; --i) {
    const int b2 = (i + 1 < 63) ? int((q >> (i + 1)) & 1) : 0;
    const int b1 = int((q >> i) & 1);
    const int b0 = i > 0 ? int((q >> (i - 1)) & 1) : 0;
    if (b2 == 0 && b1 == 1 && b0 == 0) {
      terms.push_back(sign << i);
      --i;  // skip the (zero) bit below
    } else if (b2 == 0 && b1 == 1 && b0 == 1) {
      terms.push_back(sign << (i + 1));
    } else if (b2 == 1 && b1 == 1 && b0 == 0) {
      terms.push_back(-(sign << i));
    }
  }
}

}  // namespace

extern "C" {

// Group-wise top-alpha term reveal over `n` contiguous elements.
// Groups are `group_size` consecutive elements; the final group may be
// short.  Writes dequantized results to `out` (may alias `x`).
void tr_reveal(const float* x, float* out, int64_t n, float sf, int bits,
               int64_t group_size, int64_t num_keep_terms) {
  std::vector<std::vector<int64_t>> lists;
  std::vector<size_t> heads;
  std::vector<int64_t> acc;
  for (int64_t g0 = 0; g0 < n; g0 += group_size) {
    const int64_t g = std::min(group_size, n - g0);
    lists.assign(g, {});
    heads.assign(g, 0);
    acc.assign(g, 0);
    for (int64_t j = 0; j < g; ++j) hese_encode(x[g0 + j], sf, bits, lists[j]);
    for (int64_t kept = 0; kept < num_keep_terms; ++kept) {
      int64_t best_j = -1, best_val = 0;
      for (int64_t j = 0; j < g; ++j) {  // strict >: lowest index wins ties
        const int64_t t =
            heads[j] < lists[j].size() ? lists[j][heads[j]] : 0;
        if (std::llabs(t) > std::llabs(best_val)) {
          best_val = t;
          best_j = j;
        }
      }
      if (best_val == 0) break;
      acc[best_j] += best_val;
      ++heads[best_j];
    }
    for (int64_t j = 0; j < g; ++j)
      out[g0 + j] = static_cast<float>(acc[j]) * sf;
  }
}

// Number of HESE terms of each already-quantized magnitude in `q`.
void hese_term_counts(const int64_t* q, int64_t* counts, int64_t n,
                      int bits) {
  std::vector<int64_t> terms;
  for (int64_t i = 0; i < n; ++i) {
    terms.clear();
    hese_encode(static_cast<float>(q[i]), 1.0f, bits, terms);
    counts[i] = static_cast<int64_t>(terms.size());
  }
}

}  // extern "C"
