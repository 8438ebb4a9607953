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

/* Fast encode: 2-byte bucket dispatch (the FSST paper's shortCodes idea
 * adapted to greedy longest-match).  pair_idx/pair_start partition the
 * candidate symbols by their first TWO bytes — a symbol of length >= 2
 * lives in exactly one bucket, a 1-byte symbol is replicated across all
 * 256 buckets sharing its first byte — each bucket sorted by length
 * descending, so the first hit IS the greedy longest match.  Candidate
 * compare is one u64 load + mask (symbols are left-justified in 8-byte
 * slots, sym64[i] little-endian).  Output codes are byte-identical to
 * fsst_encode / the Python scalar encoder.  The < 8-bytes-remaining
 * tail falls back to the per-first-byte tables with memcmp. */
int64_t fsst_encode_fast(const uint8_t *data, int64_t n,
                         const uint64_t *sym64, const uint8_t *sym_lens,
                         int32_t n_syms, const int32_t *pair_idx,
                         const int32_t *pair_start, /* 65537 entries */
                         const uint8_t *syms, const int32_t *cand_idx,
                         const int32_t *cand_start, /* 257 entries */
                         uint8_t *out) {
  static const uint64_t mask[9] = {0ULL,
                                   0xffULL,
                                   0xffffULL,
                                   0xffffffULL,
                                   0xffffffffULL,
                                   0xffffffffffULL,
                                   0xffffffffffffULL,
                                   0xffffffffffffffULL,
                                   0xffffffffffffffffULL};
  int64_t pos = 0, o = 0;
  int64_t fast_end = n - 8; /* positions with a full 8-byte window */
  while (pos <= fast_end) {
    uint64_t w;
    memcpy(&w, data + pos, 8);
    uint32_t bucket = ((uint32_t)data[pos] << 8) | data[pos + 1];
    int32_t lo = pair_start[bucket], hi = pair_start[bucket + 1];
    int matched = 0;
    for (int32_t c = lo; c < hi; c++) {
      int32_t si = pair_idx[c];
      uint8_t L = sym_lens[si];
      if (((w ^ sym64[si]) & mask[L]) == 0) {
        out[o++] = (uint8_t)si;
        pos += L;
        matched = 1;
        break;
      }
    }
    if (!matched) {
      out[o++] = ESCAPE;
      out[o++] = data[pos];
      pos++;
    }
  }
  while (pos < n) { /* tail: < 8 bytes left, candidate may overrun */
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
      /* 8-byte splat fast path only while provably in-bounds of the
       * caller's buffer (out_cap is the true capacity); near the end
       * fall back to an exact-length copy — safe by construction for
       * any caller, including exact-capacity buffers */
      if (o + 8 <= out_cap) {
        memcpy(out + o, syms + c * 8, 8);
      } else {
        memcpy(out + o, syms + c * 8, L);
      }
      o += L;
      i++;
    }
  }
  return o;
}
