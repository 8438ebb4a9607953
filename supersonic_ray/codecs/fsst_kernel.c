/* FSST encode/decode inner loops.
 *
 * Greedy longest-match symbol-table compression per the published FSST
 * design (VLDB 2020).  Semantics identical to the pure-Python scalar
 * encoder in fsst.py (_encode_buffer_scalar) — the Python test suite
 * asserts byte-for-byte equality.  Compiled on first import with the
 * system cc; Python/numpy paths remain as fallback.
 *
 * Symbol table layout (built by the Python wrapper):
 *   syms:      n_syms * 8 bytes, symbol i at syms[i*8], left-justified
 *   sym_lens:  n_syms bytes
 *   cand_idx:  candidate symbol indices grouped by first byte, each
 *              group sorted by length descending
 *   cand_start: 257 ints, group boundaries per first byte
 */

#include <stdint.h>
#include <string.h>

#define ESCAPE 255

int64_t fsst_encode(const uint8_t *data, int64_t n, const uint8_t *syms,
                    const uint8_t *sym_lens, int32_t n_syms,
                    const int32_t *cand_idx, const int32_t *cand_start,
                    uint8_t *out) {
  int64_t pos = 0, o = 0;
  while (pos < n) {
    uint8_t b = data[pos];
    int32_t lo = cand_start[b], hi = cand_start[b + 1];
    int64_t remaining = n - pos;
    int matched = 0;
    for (int32_t c = lo; c < hi; c++) {
      int32_t si = cand_idx[c];
      uint8_t L = sym_lens[si];
      if (L <= remaining && memcmp(data + pos, syms + si * 8, L) == 0) {
        out[o++] = (uint8_t)si;
        pos += L;
        matched = 1;
        break;
      }
    }
    if (!matched) {
      out[o++] = ESCAPE;
      out[o++] = b;
      pos++;
    }
  }
  return o;
}

int64_t fsst_decode(const uint8_t *enc, int64_t n, const uint8_t *syms,
                    const uint8_t *sym_lens, int32_t n_syms, uint8_t *out,
                    int64_t out_cap) {
  int64_t i = 0, o = 0;
  while (i < n) {
    uint8_t c = enc[i];
    if (c == ESCAPE) {
      /* truncated stream: escape with no following literal byte */
      if (i + 1 >= n) return -1;
      if (o + 1 > out_cap) return -1;
      out[o++] = enc[i + 1];
      i += 2;
    } else {
      /* corrupted stream: code beyond the symbol table */
      if (c >= n_syms) return -1;
      uint8_t L = sym_lens[c];
      if (o + L > out_cap) return -1;
      memcpy(out + o, syms + c * 8, 8 <= out_cap - o ? 8 : L); /* fast path */
      o += L;
      i++;
    }
  }
  return o;
}
