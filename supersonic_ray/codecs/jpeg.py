"""Baseline JPEG (JFIF) codec in pure Python/numpy — the round-3
verdict's "compressed multimodal codec" plug point made real without
external libraries.

Decoder (`decode_jpeg`): full baseline sequential DCT path from the
public ITU-T T.81 spec — marker parse (DQT/DHT/SOF0/SOS/DRI, APPn/COM
skipped), canonical Huffman entropy decode with 0xFF00 unstuffing, DC
prediction, dequantization in zigzag order, 8x8 IDCT via an orthonormal
DCT matrix, interleaved-MCU chroma subsampling (any integer factors,
e.g. the dominant real-web 4:2:0, replicate-upsampled), restart-marker
intervals (RSTn, DC reset + byte align), block-padding crop, and JFIF
YCbCr->RGB for 3-component images — PLUS full progressive (SOF2, T.81
G.2): spectral-selection bands, successive approximation on DC and AC
(first + refinement scans), cross-block EOB runs, interleaved DC /
non-interleaved AC scan geometry.  Restrictions (raise loudly): 8-bit
precision only, no arithmetic coding / lossless / hierarchical.

Encoder (`encode_jpeg`): the matching encoder used to synthesize
deterministic test fixtures — real 2-D DCT, quantization, run-length +
canonical Huffman coding, byte stuffing; ``progressive=True`` emits a
libjpeg-like SOF2 scan script over the SAME quantized coefficients, so
progressive and baseline encodings of one image decode bit-identically
(the test oracle).  The Huffman tables it EMITS are simple valid
canonical tables (fixed 4-bit DC / 8-bit AC codes) rather than the
Annex K defaults; decoders (including ours) read tables from the DHT
segments, so the stream is fully conformant JPEG.

This is a correctness-first reference path: the per-bit Python Huffman
loop is fine for the small fixtures the oracle query ships; production
pipelines plug libjpeg (PIL) into ImageDecoder exactly where this
slots in.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index in the zigzag sequence -> raster index in the 8x8
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II matrix: coeffs = M @ block @ M.T
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ------------------------------------------------------------------ bits

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos]
                self.pos += 1
                if nxt != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def expect_rst(self, n: int) -> None:
        """Restart boundary: drop pad bits, consume the RSTn marker
        (tolerating 0xFF fill bytes before it, T.81 B.1.1.2)."""
        self.n = 0
        while self.d[self.pos] == 0xFF and self.d[self.pos + 1] == 0xFF:
            self.pos += 1
        b0, b1 = self.d[self.pos], self.d[self.pos + 1]
        if b0 != 0xFF or b1 != 0xD0 + (n % 8):
            raise ValueError(
                f"expected RST{n % 8} marker, found 0x{b0:02X}{b1:02X}"
            )
        self.pos += 2


def _build_codes(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 C.2): (length, code) -> symbol."""
    codes: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return codes


def _read_code(r: _BitReader, codes: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = codes.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(bits: int, size: int) -> int:
    """Amplitude decode (T.81 F.12): ones'-complement negatives."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ------------------------------------------------- Annex K default tables
#
# The "typical" Huffman tables from T.81 Annex K (K.3.3).  Old-school
# MJPEG-in-AVI streams famously OMIT their DHT segments and expect the
# decoder to assume these; decode falls back to them for any table id
# the stream never defined.

_K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], bytes(range(12)))
_K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bytes(range(12)))
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)
_ANNEX_K = {
    (0, 0): _K_DC_LUMA,
    (0, 1): _K_DC_CHROMA,
    (1, 0): _K_AC_LUMA,
    (1, 1): _K_AC_CHROMA,
}


def _htable(htables: dict, tc: int, th: int) -> dict:
    """Huffman table lookup with the Annex K fallback for DHT-less
    streams (old MJPEG-in-AVI)."""
    t = htables.get((tc, th))
    if t is not None:
        return t
    k = _ANNEX_K.get((tc, th))
    if k is None:
        raise ValueError(f"stream uses undefined Huffman table (class {tc}, id {th})")
    t = _build_codes(*k)
    htables[(tc, th)] = t
    return t


# --------------------------------------------------------------- encoder

# simple valid canonical tables the encoder EMITS into DHT (decoders
# read tables from the stream, so these need only be valid, not Annex K)
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _encode_block(bw, block, q, enc_dc, enc_dc_len, enc_ac, enc_ac_len, prev_dc, ci):
    coef = _M @ (block - 128.0) @ _M.T
    qc = np.round(coef / q).astype(np.int64).reshape(-1)[_ZIGZAG]
    diff = int(qc[0]) - prev_dc[ci]
    prev_dc[ci] = int(qc[0])
    size = _category(diff)
    bw.write(enc_dc[size], enc_dc_len[size])
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(amp, size)
    run = 0
    last_nz = int(np.max(np.nonzero(qc)[0])) if np.any(qc[1:]) else 0
    for i in range(1, 64):
        v = int(qc[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(enc_ac[0xF0], enc_ac_len[0xF0])  # ZRL
            run -= 16
        size = _category(v)
        sym = (run << 4) | size
        bw.write(enc_ac[sym], enc_ac_len[sym])
        amp = v if v > 0 else v + (1 << size) - 1
        bw.write(amp, size)
        run = 0
    if last_nz < 63:
        bw.write(enc_ac[0x00], enc_ac_len[0x00])  # EOB


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
    tables: str = "custom",
    omit_dht: bool = False,
) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as JFIF with
    one shared quant + Huffman table set.  ``subsampling``: "4:4:4" or
    "4:2:0" (chroma box-averaged 2x2 — the dominant real-web layout).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that-many MCUs (DC predictors reset, bitstream byte-aligned;
    baseline only).  ``progressive=True`` emits SOF2 with a
    libjpeg-like scan script — interleaved DC first, per-component
    spectral AC bands, successive-approximation refinement passes on
    both DC and AC — encoding the SAME quantized coefficients, so the
    decoded pixels are bit-identical to the baseline encoding."""
    if progressive and restart_interval:
        raise ValueError("restart intervals are supported on the baseline path only")
    if tables not in ("custom", "annex_k"):
        raise ValueError(f"tables must be 'custom' or 'annex_k', got {tables!r}")
    if tables == "annex_k" and progressive:
        raise ValueError("annex_k tables lack the EOBn>0 symbols progressive scans emit")
    if omit_dht and tables != "annex_k":
        raise ValueError("omit_dht requires tables='annex_k' (decoders assume Annex K)")
    img = np.asarray(img)
    if img.ndim == 2:
        comps = [img.astype(np.float64)]
        samp = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            def down2(p):
                hh, ww = p.shape
                p = np.pad(p, ((0, hh % 2), (0, ww % 2)), mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

            comps = [y, down2(cb), down2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            comps = [y, cb, cr]
            samp = [(1, 1)] * 3
        else:
            raise ValueError(f"unknown subsampling {subsampling!r}")
    else:
        raise ValueError("img must be HxW or HxWx3 uint8")
    h, w = img.shape[:2]
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    q = np.asarray(quant, dtype=np.int64).reshape(8, 8)
    H = max(s[0] for s in samp)
    V = max(s[1] for s in samp)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q.reshape(-1)[_ZIGZAG]))  # DQT
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    ncomp = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hs, vs = samp[cid - 1]
        sof += bytes([cid, (hs << 4) | vs, 0x00])
    out += _seg(0xC2 if progressive else 0xC0, sof)  # SOF0 baseline / SOF2
    if tables == "annex_k":
        # per-class tables: id 0 = luma (component 0), id 1 = chroma;
        # omit_dht leaves the stream table-less (old MJPEG-in-AVI),
        # relying on the decoder's Annex K fallback
        table_sets = [
            (_build_codes(*_K_DC_LUMA), _build_codes(*_K_AC_LUMA)),
            (_build_codes(*_K_DC_CHROMA), _build_codes(*_K_AC_CHROMA)),
        ]
        if not omit_dht:
            out += _seg(0xC4, bytes([0x00]) + bytes(_K_DC_LUMA[0]) + _K_DC_LUMA[1])
            out += _seg(0xC4, bytes([0x10]) + bytes(_K_AC_LUMA[0]) + _K_AC_LUMA[1])
            out += _seg(0xC4, bytes([0x01]) + bytes(_K_DC_CHROMA[0]) + _K_DC_CHROMA[1])
            out += _seg(0xC4, bytes([0x11]) + bytes(_K_AC_CHROMA[0]) + _K_AC_CHROMA[1])
    else:
        ac_counts = _PAC_COUNTS if progressive else _AC_COUNTS
        ac_symbols = _PAC_SYMBOLS if progressive else _AC_SYMBOLS
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)  # DHT DC0
        out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symbols)  # DHT AC0
        table_sets = [(_build_codes(_DC_COUNTS, _DC_SYMBOLS), _build_codes(ac_counts, ac_symbols))]

    def enc_maps(ti):
        dc_codes, ac_codes = table_sets[min(ti, len(table_sets) - 1)]
        return (
            {sym: code for (length, code), sym in dc_codes.items()},
            {sym: length for (length, code), sym in dc_codes.items()},
            {sym: code for (length, code), sym in ac_codes.items()},
            {sym: length for (length, code), sym in ac_codes.items()},
        )

    # component ci uses table id 0 (luma) for ci == 0 else 1 (chroma)
    # when two table sets exist; a single shared set otherwise
    comp_tabs = [enc_maps(0 if ci == 0 else 1) for ci in range(ncomp)]
    comp_tids = [0 if (ci == 0 or len(table_sets) == 1) else 1 for ci in range(ncomp)]
    enc_dc, enc_dc_len, enc_ac, enc_ac_len = comp_tabs[0]

    mcux, mcuy = -(-w // (8 * H)), -(-h // (8 * V))
    # edge-replicate pad each component plane to its MCU multiple
    padded = []
    for (hs, vs), c in zip(samp, comps):
        ph, pw = mcuy * 8 * vs, mcux * 8 * hs
        padded.append(np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])), mode="edge"))

    if progressive:
        qz_grids = []
        for (hs, vs), comp in zip(samp, padded):
            bh_, bw2 = comp.shape[0] // 8, comp.shape[1] // 8
            blocks = comp.reshape(bh_, 8, bw2, 8).transpose(0, 2, 1, 3)
            coef = np.einsum("ab,ijbc,cd->ijad", _M, blocks - 128.0, _M.T)
            qz_grids.append(
                np.round(coef / q).astype(np.int64).reshape(bh_, bw2, 64)[:, :, _ZIGZAG]
            )
        # component pixel dims -> ceil-block grids for the AC scans
        cw_ch = [(-(-w * hs // H), -(-h * vs // V)) for hs, vs in samp]
        out += _encode_progressive(
            qz_grids, samp, ncomp, mcux, mcuy, cw_ch,
            (enc_dc, enc_dc_len, enc_ac, enc_ac_len),
        )
        out += b"\xff\xd9"
        return bytes(out)

    sos = bytes([ncomp]) + b"".join(
        bytes([cid, (comp_tids[cid - 1] << 4) | comp_tids[cid - 1]])
        for cid in range(1, ncomp + 1)
    )
    out += _seg(0xDA, sos + bytes([0x00, 0x3F, 0x00]))

    bw = _BitWriter()
    prev_dc = [0] * ncomp
    rst = 0
    for mcu in range(mcuy * mcux):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            prev_dc = [0] * ncomp
        by, bx = divmod(mcu, mcux)
        for ci, ((hs, vs), comp) in enumerate(zip(samp, padded)):
            for v in range(vs):
                for hh in range(hs):
                    yy = (by * vs + v) * 8
                    xx = (bx * hs + hh) * 8
                    cdc, cdl, cac, cal = comp_tabs[ci]
                    _encode_block(
                        bw, comp[yy : yy + 8, xx : xx + 8], q,
                        cdc, cdl, cac, cal, prev_dc, ci,
                    )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------- progressive decoder


class _ProgressiveState:
    """Coefficient accumulator for progressive JPEG (T.81 G.2): each SOS
    scan deposits a spectral band (Ss..Se) at a precision (Ah/Al) into
    per-component zigzag-order coefficient grids; ``reconstruct``
    dequantizes + IDCTs once at the end.

    Supports interleaved DC scans, non-interleaved AC scans, successive
    approximation on both (first + refinement passes), cross-block EOB
    runs, and restart markers (DC predictor + EOB-run reset)."""

    def __init__(self, frame):
        h, w, fcomps = frame
        self.h, self.w, self.fcomps = h, w, fcomps
        self.H = max(c[1] for c in fcomps)
        self.V = max(c[2] for c in fcomps)
        self.mcux = -(-w // (8 * self.H))
        self.mcuy = -(-h // (8 * self.V))
        # coefficient grids sized to the MCU-padded geometry; zigzag order
        self.coefs = [
            np.zeros((self.mcuy * vs, self.mcux * hs, 64), dtype=np.int32)
            for _, hs, vs, _ in fcomps
        ]
        self.eobrun = 0

    def _comp_index(self, cid: int) -> int:
        for i, (c, *_rest) in enumerate(self.fcomps):
            if c == cid:
                return i
        raise ValueError(f"scan references unknown component id {cid}")

    # ---- per-block scan primitives (T.81 G.2 / libjpeg jdphuff shapes)

    def _dc_first(self, r, blk, dc_codes, pred, ci, al):
        size = _read_code(r, dc_codes)
        diff = _extend(r.bits(size), size)
        pred[ci] += diff
        blk[0] = pred[ci] << al

    def _dc_refine(self, r, blk, al):
        if r.bit():
            blk[0] = int(blk[0]) | (1 << al)

    def _ac_first(self, r, blk, ac_codes, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _read_code(r, ac_codes)
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                self.eobrun = (1 << run) - 1
                if run:
                    self.eobrun += r.bits(run)
                return
            k += run
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(r.bits(size), size) << al
            k += 1

    def _ac_refine(self, r, blk, ac_codes, ss, se, al):
        p1 = 1 << al

        def correct(k):
            v = int(blk[k])
            if r.bit() and (abs(v) & p1) == 0:
                blk[k] = v + p1 if v > 0 else v - p1

        k = ss
        if self.eobrun == 0:
            while k <= se:
                sym = _read_code(r, ac_codes)
                run, size = sym >> 4, sym & 0x0F
                newval = 0
                if size == 0:
                    if run != 15:  # EOBn
                        self.eobrun = 1 << run
                        if run:
                            self.eobrun += r.bits(run)
                        break
                    # ZRL: skip 16 zero-history positions
                else:
                    if size != 1:
                        raise ValueError("AC refinement size must be 1")
                    newval = p1 if r.bit() else -p1
                # advance over `run` zero-history coefficients; nonzero-
                # history positions receive correction bits and do not
                # count toward the run
                while k <= se:
                    if int(blk[k]) != 0:
                        correct(k)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if self.eobrun > 0:
            while k <= se:
                if int(blk[k]) != 0:
                    correct(k)
                k += 1
            self.eobrun -= 1

    # ---- whole-scan driver

    def decode_scan(self, data, scan, ss, se, ah, al, htables, restart_interval):
        r = _BitReader(data)
        self.eobrun = 0
        is_dc = ss == 0
        if is_dc and se != 0:
            raise ValueError("progressive scan cannot mix DC and AC bands")
        if not is_dc and len(scan) != 1:
            raise ValueError("progressive AC scans must be non-interleaved")
        pred = [0] * len(self.fcomps)
        rst = 0
        units = 0

        def maybe_restart():
            nonlocal rst, pred
            if restart_interval and units and units % restart_interval == 0:
                r.expect_rst(rst)
                rst += 1
                pred = [0] * len(self.fcomps)
                self.eobrun = 0

        if is_dc and len(scan) > 1:
            # interleaved DC scan over the MCU grid
            tds = {}
            for cid, td, _ta in scan:
                tds[self._comp_index(cid)] = _htable(htables, 0, td)
            for mcu in range(self.mcuy * self.mcux):
                maybe_restart()
                units += 1
                by, bx = divmod(mcu, self.mcux)
                for ci, (_cid, hs, vs, _tq) in enumerate(self.fcomps):
                    for v in range(vs):
                        for hh in range(hs):
                            blk = self.coefs[ci][by * vs + v, bx * hs + hh]
                            if ah == 0:
                                self._dc_first(r, blk, tds[ci], pred, ci, al)
                            else:
                                self._dc_refine(r, blk, al)
            return
        # non-interleaved scan (single component): block grid is the
        # component's OWN ceil(cw/8) x ceil(ch/8), not the MCU-padded one
        cid, td, ta = scan[0]
        ci = self._comp_index(cid)
        _c, hs, vs, _tq = self.fcomps[ci]
        cw = -(-self.w * hs // self.H)
        ch = -(-self.h * vs // self.V)
        bw_, bh_ = -(-cw // 8), -(-ch // 8)
        dc_codes = _htable(htables, 0, td) if is_dc else None
        ac_codes = _htable(htables, 1, ta) if not is_dc else None
        for bi in range(bh_ * bw_):
            maybe_restart()
            units += 1
            by, bx = divmod(bi, bw_)
            blk = self.coefs[ci][by, bx]
            if is_dc:
                if ah == 0:
                    self._dc_first(r, blk, dc_codes, pred, ci, al)
                else:
                    self._dc_refine(r, blk, al)
            elif ah == 0:
                self._ac_first(r, blk, ac_codes, ss, se, al)
            else:
                self._ac_refine(r, blk, ac_codes, ss, se, al)

    # ---- final reconstruction

    def reconstruct(self, qtables):
        h, w = self.h, self.w
        planes = []
        for (cid, hs, vs, tq), zz in zip(self.fcomps, self.coefs):
            q = qtables[tq].reshape(-1)[_ZIGZAG]  # quant in zigzag order
            deq = zz.astype(np.float64) * q  # (by, bx, 64) zigzag
            rast = np.zeros_like(deq)
            rast[:, :, _ZIGZAG] = deq
            blocks = rast.reshape(rast.shape[0], rast.shape[1], 8, 8)
            # IDCT all blocks at once: M.T @ B @ M
            px = np.einsum("ab,ijbc,cd->ijad", _M.T, blocks, _M) + 128.0
            plane = px.transpose(0, 2, 1, 3).reshape(
                blocks.shape[0] * 8, blocks.shape[1] * 8
            )
            cw_ = -(-w * hs // self.H)
            ch_ = -(-h * vs // self.V)
            plane = plane[:ch_, :cw_]
            if hs != self.H or vs != self.V:
                plane = np.repeat(np.repeat(plane, self.V // vs, axis=0), self.H // hs, axis=1)
            planes.append(plane[:h, :w])
        ncomp = len(planes)
        if ncomp == 1:
            px = planes[0][..., None]
        elif ncomp == 3:
            y, cb, cr = planes
            rr = y + 1.402 * (cr - 128.0)
            gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            bb = y + 1.772 * (cb - 128.0)
            px = np.stack([rr, gg, bb], axis=2)
        else:
            raise ValueError(f"{ncomp}-component JPEG unsupported")
        px = np.clip(np.round(px), 0, 255)
        return w, h, ncomp, (px / 255.0).astype(np.float32)


# ------------------------------------------------- progressive encoder

# progressive AC tables need the EOBn symbols (n<<4, n=1..14) on top of
# the baseline set; everything sits in one 8-bit-length bucket
_PAC_SYMBOLS = bytes(
    [n << 4 for n in range(15)]  # EOB0..EOB14 (0x00 is EOB0)
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_PAC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_PAC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]


class _ScanWriter:
    """Per-scan entropy writer with cross-block EOB-run + buffered
    correction bits (the encoder mirror of T.81 G.2 / libjpeg
    jcphuff)."""

    def __init__(self, enc_dc, enc_dc_len, enc_ac, enc_ac_len):
        self.bw = _BitWriter()
        self.enc_dc, self.enc_dc_len = enc_dc, enc_dc_len
        self.enc_ac, self.enc_ac_len = enc_ac, enc_ac_len
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eobrun(self):
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            sym = n << 4
            self.bw.write(self.enc_ac[sym], self.enc_ac_len[sym])
            if n:
                self.bw.write(self.eobrun - (1 << n), n)
            for b in self.pending:
                self.bw.write(b, 1)
            self.pending = []
            self.eobrun = 0

    def dc_first(self, dc_shifted: int, pred: list, ci: int):
        diff = dc_shifted - pred[ci]
        pred[ci] = dc_shifted
        size = _category(diff)
        self.bw.write(self.enc_dc[size], self.enc_dc_len[size])
        if size:
            amp = diff if diff > 0 else diff + (1 << size) - 1
            self.bw.write(amp, size)

    def dc_refine(self, bit: int):
        self.bw.write(bit, 1)

    def ac_first(self, zz, ss: int, se: int, al: int):
        vals = [
            (int(np.sign(zz[k])) * (abs(int(zz[k])) >> al)) for k in range(ss, se + 1)
        ]
        last_nz = -1
        for i, v in enumerate(vals):
            if v:
                last_nz = i
        if last_nz < 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()
            return
        self.flush_eobrun()
        run = 0
        for i in range(last_nz + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                self.bw.write(self.enc_ac[0xF0], self.enc_ac_len[0xF0])
                run -= 16
            size = _category(v)
            sym = (run << 4) | size
            self.bw.write(self.enc_ac[sym], self.enc_ac_len[sym])
            amp = v if v > 0 else v + (1 << size) - 1
            self.bw.write(amp, size)
            run = 0
        if last_nz < se - ss:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def ac_refine(self, zz, ss: int, se: int, al: int):
        r = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            a = abs(int(zz[k])) >> al
            if a == 0:
                r += 1
                continue
            if a > 1:  # already significant at Ah: buffer correction bit
                br.append(a & 1)
                continue
            # newly significant (magnitude exactly 1 at this precision)
            self.flush_eobrun()
            while r > 15:
                self.bw.write(self.enc_ac[0xF0], self.enc_ac_len[0xF0])
                for b in br:
                    self.bw.write(b, 1)
                br = []
                r -= 16
            sym = (r << 4) | 1
            self.bw.write(self.enc_ac[sym], self.enc_ac_len[sym])
            self.bw.write(1 if int(zz[k]) > 0 else 0, 1)
            for b in br:
                self.bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.bw.flush()
        return bytes(self.bw.buf)


def _encode_progressive(qz_grids, samp, ncomp, mcux, mcuy, cw_ch, enc_tabs) -> bytes:
    """Emit the scan sequence (a libjpeg-like script): interleaved DC
    first (Al=1), per-component AC bands (Ss 1-5 then 6-63, Al=2), AC
    refinement 2→1, DC refinement, AC refinement 1→0."""
    enc_dc, enc_dc_len, enc_ac, enc_ac_len = enc_tabs
    out = bytearray()

    def sos_header(comps_in_scan, ss, se, ah, al) -> bytes:
        body = bytes([len(comps_in_scan)])
        for cid in comps_in_scan:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def new_writer() -> _ScanWriter:
        return _ScanWriter(enc_dc, enc_dc_len, enc_ac, enc_ac_len)

    # 1. DC first, all components, Al=1
    sw = new_writer()
    pred = [0] * ncomp
    for mcu in range(mcuy * mcux):
        by, bx = divmod(mcu, mcux)
        for ci in range(ncomp):
            hs, vs = samp[ci]
            for v in range(vs):
                for hh in range(hs):
                    dc = int(qz_grids[ci][by * vs + v, bx * hs + hh, 0])
                    sw.dc_first(dc >> 1, pred, ci)
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, 1) + sw.finish()

    def ac_scan(ci, ss, se, ah, al):
        sw = new_writer()
        cw, ch = cw_ch[ci]
        bw_, bh_ = -(-cw // 8), -(-ch // 8)
        for bi in range(bh_ * bw_):
            by, bx = divmod(bi, bw_)
            zz = qz_grids[ci][by, bx]
            if ah == 0:
                sw.ac_first(zz, ss, se, al)
            else:
                sw.ac_refine(zz, ss, se, al)
        return sos_header([ci + 1], ss, se, ah, al) + sw.finish()

    # 2-3. AC first passes at Al=2, split spectral bands
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 5, 0, 2)
        out += ac_scan(ci, 6, 63, 0, 2)
    # 4. AC refinement 2 -> 1
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 63, 2, 1)
    # 5. DC refinement (bit 0)
    sw = new_writer()
    for mcu in range(mcuy * mcux):
        by, bx = divmod(mcu, mcux)
        for ci in range(ncomp):
            hs, vs = samp[ci]
            for v in range(vs):
                for hh in range(hs):
                    sw.dc_refine(int(qz_grids[ci][by * vs + v, bx * hs + hh, 0]) & 1)
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 1, 0) + sw.finish()
    # 6. AC refinement 1 -> 0
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 63, 1, 0)
    return bytes(out)


# --------------------------------------------------------------- decoder

def decode_jpeg(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode JFIF → (width, height, channels, float32 pixels HxWxC in
    [0,1]).  Baseline sequential (SOF0/SOF1) takes the one-scan fast
    path below; progressive (SOF2 — the other dominant real-web layout)
    accumulates coefficients across its DC/AC spectral-selection and
    successive-approximation scans and reconstructs at the end.  Same
    return contract as decode_bmp/decode_ppm."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> codes
    frame = None  # (h, w, [(cid, hq, vq, tq)])
    scan = None
    restart_interval = 0
    progressive = False
    prog = None  # _ProgressiveState

    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them or 'FF FF DB' would misparse as
        # marker=0xFF + a bogus 0xFFDB segment length
        while blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        (seglen,) = struct.unpack_from(">H", blob, pos)
        body = blob[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                zz = np.frombuffer(body, dtype=np.uint8, count=64, offset=bp).astype(np.int64)
                bp += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = zz
                qtables[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                counts = list(body[bp : bp + 16])
                bp += 16
                nsym = sum(counts)
                symbols = body[bp : bp + nsym]
                bp += nsym
                htables[(tc, th)] = _build_codes(counts, symbols)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = samp >> 4, samp & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"invalid sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            if progressive:
                prog = _ProgressiveState(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"SOF 0x{marker:02X} unsupported (lossless/arithmetic/hierarchical)")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F) for i in range(ns)]
            if progressive:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                end = _entropy_end(blob, pos)
                prog.decode_scan(
                    blob[pos:end], scan, ss, se, ahal >> 4, ahal & 0x0F,
                    htables, restart_interval,
                )
                pos = end
                continue
            break
        # APPn / COM / others: skip

    if progressive:
        return prog.reconstruct(qtables)
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w, fcomps = frame
    ncomp = len(fcomps)
    if len(scan) != ncomp:
        raise ValueError("partial scans unsupported")
    H = max(c[1] for c in fcomps)
    V = max(c[2] for c in fcomps)
    for _, hs, vs, _ in fcomps:
        if H % hs or V % vs:
            raise ValueError(f"non-integer sampling ratio {hs}x{vs} vs {H}x{V}")

    r = _BitReader(blob[pos:])
    mcux, mcuy = -(-w // (8 * H)), -(-h // (8 * V))
    planes = [
        np.zeros((mcuy * 8 * vs, mcux * 8 * hs), dtype=np.float64)
        for _, hs, vs, _ in fcomps
    ]
    prev_dc = [0] * ncomp
    comp_info = []
    for (cid, hs, vs, tq), (scid, td, ta) in zip(fcomps, scan):
        if cid != scid:
            raise ValueError("scan component order differs from frame")
        comp_info.append((qtables[tq], _htable(htables, 0, td), _htable(htables, 1, ta), hs, vs))

    def read_block(q, dc_codes, ac_codes, ci) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        size = _read_code(r, dc_codes)
        diff = _extend(r.bits(size), size)
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = _read_code(r, ac_codes)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(r.bits(size), size)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        coef[_ZIGZAG] = zz * q.reshape(-1)[_ZIGZAG]
        return _M.T @ coef.reshape(8, 8) @ _M + 128.0

    rst = 0
    for mcu in range(mcuy * mcux):
        if restart_interval and mcu and mcu % restart_interval == 0:
            r.expect_rst(rst)
            rst += 1
            prev_dc = [0] * ncomp
        by, bx = divmod(mcu, mcux)
        for ci, (q, dc_codes, ac_codes, hs, vs) in enumerate(comp_info):
            for v in range(vs):
                for hh in range(hs):
                    yy = (by * vs + v) * 8
                    xx = (bx * hs + hh) * 8
                    planes[ci][yy : yy + 8, xx : xx + 8] = read_block(
                        q, dc_codes, ac_codes, ci
                    )

    # crop each plane to its component resolution, then replicate-
    # upsample to full frame (valid decoder choice; libjpeg's "fancy"
    # interpolated upsampling is an optional refinement)
    full = []
    for (cid, hs, vs, tq), p in zip(fcomps, planes):
        cw, ch = -(-w * hs // H), -(-h * vs // V)
        p = p[:ch, :cw]
        if hs != H or vs != V:
            p = np.repeat(np.repeat(p, V // vs, axis=0), H // hs, axis=1)
        full.append(p[:h, :w])
    planes = full
    if ncomp == 1:
        px = planes[0][..., None]
    elif ncomp == 3:
        y, cb, cr = planes
        rr = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = y + 1.772 * (cb - 128.0)
        px = np.stack([rr, gg, bb], axis=2)
    else:
        raise ValueError(f"{ncomp}-component JPEG unsupported")
    px = np.clip(np.round(px), 0, 255)
    return w, h, ncomp, (px / 255.0).astype(np.float32)


# ------------------------------------------------------- MJPEG demux

def _entropy_end(blob: bytes, pos: int) -> int:
    """Scan entropy-coded data starting at ``pos``; return the index of
    the 0xFF that begins the next REAL marker.  Structure-aware (T.81
    B.1.1.5): 0xFF00 is a stuffed literal, 0xFFD0-D7 are restart
    markers, 0xFFFF is a fill byte — none of them end the scan, so a
    byte-blind ``find(b'\\xff\\xd9')`` false-positive is impossible."""
    n = len(blob)
    while True:
        i = blob.find(b"\xff", pos)
        if i < 0 or i + 1 >= n:
            return n
        m = blob[i + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            pos = i + 2
        elif m == 0xFF:  # fill byte; the next byte may be the marker
            pos = i + 1
        else:
            return i


def jpeg_dimensions(blob: bytes) -> tuple[int, int, int]:
    """Cheap metadata path: parse headers only (no entropy decode) →
    (width, height, channels) from the SOF segment.  This is what a
    frame sampler uses for the frames it SKIPS."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(blob)
    while pos + 1 < n:
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", blob, pos)
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            h, w = struct.unpack_from(">HH", blob, pos + 3)
            return w, h, blob[pos + 7]
        pos += seglen
    raise ValueError("no SOF segment before scan data")


def split_avi_mjpeg(blob: bytes) -> list[bytes]:
    """Demux an AVI container's MJPEG video frames: RIFF 'AVI ' → LIST
    'movi' → '..dc'/'..db' chunks, each one JPEG image (the standard
    MJPG fourcc layout; DHT-less frames decode via the Annex K
    fallback).  Audio and index chunks are skipped."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            (sz,) = struct.unpack_from("<I", blob, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                ltype = blob[body_start : body_start + 4]
                if ltype in (b"movi", b"rec "):
                    walk(body_start + 4, body_start + sz)
            elif cid[2:4] in (b"dc", b"db"):
                frame = blob[body_start : body_start + sz]
                if frame[:2] == b"\xff\xd8":  # some encoders pad empties
                    frames.append(frame)
            pos = body_start + sz + (sz & 1)  # chunks are word-aligned

    walk(12, len(blob))
    return frames


def make_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 25) -> bytes:
    """Minimal AVI writer around MJPEG frames (hdrl with avih+strl, one
    movi LIST of 00dc chunks) — the fixture counterpart of
    split_avi_mjpeg."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D, width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def split_mjpeg(blob: bytes) -> list[bytes]:
    """Demux an MJPEG stream (back-to-back JFIF images — the actual
    payload of webcam streams and AVI/MOV 'mjpa' tracks) into one
    bytes object per frame.  Marker-walk per frame: length-delimited
    segments are skipped by their length field and entropy data is
    skipped structure-aware (_entropy_end), so frame boundaries are
    exact even when pixel data happens to contain FFD8/FFD9."""
    frames: list[bytes] = []
    pos, n = 0, len(blob)
    while pos < n:
        if blob[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG: expected SOI at byte {pos}")
        start = pos
        p = pos + 2
        while True:
            if p + 1 >= n:
                raise ValueError("MJPEG: truncated frame (no EOI)")
            if blob[p] != 0xFF:
                raise ValueError(f"MJPEG: expected marker at byte {p}")
            while blob[p + 1] == 0xFF:  # fill bytes
                p += 1
            marker = blob[p + 1]
            p += 2
            if marker == 0xD9:  # EOI — frame complete
                frames.append(blob[start:p])
                pos = p
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack_from(">H", blob, p)
            p += seglen
            if marker == 0xDA:  # SOS: entropy data follows the header
                p = _entropy_end(blob, p)
    return frames
