// paropack: native packing/unpacking kernels for PARO checkpoints.
//
// Host-side hot path of checkpoint conversion: nibble-packing multi-GB int4
// weight tensors (PARO-TPU half-split layout, see
// paroquant_tpu/ops/packing.py) and the AWQ int32 nibble-reorder layout used
// by reference checkpoints (reference cli/convert.py:149-155). OpenMP across
// rows; exposed to Python via ctypes (no pybind dependency).
//
// Build: make -C native   (produces libparopack.so)

#include <cstdint>
#include <cstring>

extern "C" {

// q: int32 [I, O] values in [0, 16); out: uint8 [I/2, O].
// PARO-TPU half-split: within each group of `group_size` input rows, row k
// (k < gs/2) packs with row k + gs/2: low nibble = first half, high = second.
void pack_w4_tpu(const int32_t *q, uint8_t *out, int64_t I, int64_t O,
                 int64_t group_size) {
  const int64_t half = group_size / 2;
  const int64_t num_groups = I / group_size;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t g = 0; g < num_groups; ++g) {
    for (int64_t k = 0; k < half; ++k) {
      const int32_t *lo = q + (g * group_size + k) * O;
      const int32_t *hi = q + (g * group_size + half + k) * O;
      uint8_t *dst = out + (g * half + k) * O;
      for (int64_t o = 0; o < O; ++o) {
        dst[o] = (uint8_t)((lo[o] & 0xF) | ((hi[o] & 0xF) << 4));
      }
    }
  }
}

// packed: uint8 [I/2, O] -> out int32 [I, O] (inverse of pack_w4_tpu)
void unpack_w4_tpu(const uint8_t *packed, int32_t *out, int64_t I, int64_t O,
                   int64_t group_size) {
  const int64_t half = group_size / 2;
  const int64_t num_groups = I / group_size;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t g = 0; g < num_groups; ++g) {
    for (int64_t k = 0; k < half; ++k) {
      const uint8_t *src = packed + (g * half + k) * O;
      int32_t *lo = out + (g * group_size + k) * O;
      int32_t *hi = out + (g * group_size + half + k) * O;
      for (int64_t o = 0; o < O; ++o) {
        lo[o] = src[o] & 0xF;
        hi[o] = (src[o] >> 4) & 0xF;
      }
    }
  }
}

static const int AWQ_ORDER[8] = {0, 2, 4, 6, 1, 3, 5, 7};

// vals: int32 [R, C] in [0,16) -> out int32 [R, C/8], AWQ nibble reorder.
void pack_awq(const int32_t *vals, int32_t *out, int64_t R, int64_t C) {
  const int64_t Cp = C / 8;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < R; ++r) {
    const int32_t *src = vals + r * C;
    int32_t *dst = out + r * Cp;
    for (int64_t c = 0; c < Cp; ++c) {
      uint32_t word = 0;
      for (int i = 0; i < 8; ++i) {
        word |= (uint32_t)(src[c * 8 + AWQ_ORDER[i]] & 0xF) << (4 * i);
      }
      dst[c] = (int32_t)word;
    }
  }
}

// packed: int32 [R, C/8] -> out int32 [R, C] (inverse of pack_awq)
void unpack_awq(const int32_t *packed, int32_t *out, int64_t R, int64_t Cp) {
  const int64_t C = Cp * 8;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < R; ++r) {
    const int32_t *src = packed + r * Cp;
    int32_t *dst = out + r * C;
    for (int64_t c = 0; c < Cp; ++c) {
      uint32_t word = (uint32_t)src[c];
      for (int i = 0; i < 8; ++i) {
        dst[c * 8 + AWQ_ORDER[i]] = (int32_t)((word >> (4 * i)) & 0xF);
      }
    }
  }
}

// Prompt-lookup drafting (serve/generator.py _lookup_draft): find the most
// recent earlier occurrence of the longest suffix n-gram of ctx and copy the
// k tokens that follow it. Returns the number of drafted tokens (0 = no
// match). Host hot path of speculative decoding: called per slot per
// scheduler tick on contexts up to max_len tokens.
int64_t lookup_draft(const int32_t *ctx, int64_t len, int64_t max_ngram,
                     int64_t k, int32_t *out) {
  if (len < 2) return 0;
  int64_t n0 = max_ngram < len - 1 ? max_ngram : len - 1;
  for (int64_t n = n0; n >= 1; --n) {
    const int32_t *pat = ctx + (len - n);
    for (int64_t i = len - n - 1; i >= 0; --i) {
      if (std::memcmp(ctx + i, pat, n * sizeof(int32_t)) == 0) {
        int64_t avail = len - (i + n);
        int64_t take = avail < k ? avail : k;
        std::memcpy(out, ctx + i + n, take * sizeof(int32_t));
        return take;
      }
    }
  }
  return 0;
}

}  // extern "C"
