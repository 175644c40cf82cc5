"""Baseline JPEG codec (ITU-T T.81, sequential DCT) in pure
numpy/stdlib — the third real compressed-image codec behind the
multimodal dispatch (`multimodal.decode_image`), closing the
"JPEG is a loud stub" gap the same way PNG/BMP/WAV were closed:
actual container bytes end-to-end, no PIL/libjpeg.

Scope (documented subset, everything else raises loudly):
* encode: 8-bit RGB or grayscale, baseline sequential, 4:4:4 /
  4:2:0 / 4:2:2 / 4:4:0 chroma subsampling (box-filter chroma
  downsample, interleaved MCUs per B.2.3), Annex K quantization
  tables scaled by the libjpeg quality formula, Annex K.3 default
  Huffman tables.
* decode: baseline SOF0 AND progressive SOF2 (T.81 Annex G:
  DC-first/DC-refine, AC spectral-selection bands with EOB-run
  codes, AC successive-approximation refinement with correction
  bits, mid-stream DHT/DRI redefinition), 8-bit, 1 or 3 components
  at any 1/2 sampling-factor mix (4:4:4, 4:2:0, 4:2:2, 4:4:0 — the
  web norm), Huffman tables read from the stream's DHT segments
  (NOT assumed), restart markers honored, 0xFF00 byte-stuffing
  unstuffed, replicated-pixel chroma upsample.
* progressive encode (``encode_jpeg_progressive``): the standard
  DC(Al=1) -> DC-refine -> per-component AC(Al=1) -> AC-refine scan
  script with per-scan OPTIMAL Huffman tables (Annex K.2 two-pass —
  the baseline Annex K tables lack EOBn codes); carries the same
  quantized coefficients as the baseline encoder, so progressive
  decode is BIT-IDENTICAL to baseline decode (the roundtrip
  oracle).  Arithmetic-coded or 12-bit streams raise
  ``NotImplementedError`` naming the missing piece.

JPEG is lossy, so unlike PNG there is no bit-roundtrip oracle; the
codec contract is tested as decode(encode(img)) ≈ img (mean
absolute error bounded by the quantization step) plus bit-exact
encoder determinism, and q94 gates the Spark-side decode against
the synth ground truth with a PSNR floor.

Reference counterpart: none (facs never touches media); this is
engine-breadth for the multimodal column story (SURVEY §2 LLM-data
tier).  All constants are from the public spec (T.81 Annex K).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# T.81 Annex K.1/K.2 quantization tables, natural (row-major) order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag scan order: ZIGZAG[k] = natural index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# T.81 Annex K.3 default Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: fwd = D @ B @ D.T, inv = D.T @ C @ D
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _D[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_tables(quality: int) -> tuple:
    """libjpeg quality scaling: 1..100 → scaled Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _build_codes(bits, vals) -> dict:
    """Canonical Huffman per T.81 C.2: value -> (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:            # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        # drop emitted bytes from acc — otherwise it grows into an
        # arbitrarily long bigint and every write slows with scan
        # length (same quadratic term as the reader's fill)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


# ---------------------------------------------------------------- encode
def _block_coeffs(plane: np.ndarray, qt: np.ndarray,
                  nby: int, nbx: int) -> np.ndarray:
    """(nby, nbx, 64) zigzag-ordered quantized DCT coefficients of a
    plane edge-padded to the (nby*8, nbx*8) block grid."""
    h, w = plane.shape
    pad = np.pad(plane, ((0, nby * 8 - h), (0, nbx * 8 - w)),
                 mode="edge")
    blocks = (pad.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8) - 128.0)
    f = _D @ blocks @ _D.T          # batched 2-D DCT
    qz = np.round(f.reshape(-1, 64) / qt).astype(np.int32)
    return qz[:, ZIGZAG].reshape(nby, nbx, 64)


def _write_block(bw: "_BitWriter", blk: np.ndarray, pred: int,
                 dct: dict, act: dict) -> int:
    """Entropy-code one zigzag block; returns the new DC predictor."""
    diff = int(blk[0]) - pred
    s = _magnitude(diff)
    code, ln = dct[s]
    bw.write(code, ln)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    nz = np.flatnonzero(blk[1:])
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]              # ZRL
            bw.write(code, ln)
            run -= 16
        s = _magnitude(v)
        code, ln = act[(run << 4) | s]
        bw.write(code, ln)
        ev = v if v >= 0 else v + (1 << s) - 1
        bw.write(ev, s)
        run = 0
    if last < 63:
        code, ln = act[0x00]                  # EOB
        bw.write(code, ln)
    return int(blk[0])


def _prepare(px: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: color transform, chroma
    downsample, per-component quantized zigzag coefficient grids.
    Returns (coeffs, factors, gray, h, w, mcux, mcuy, ql, qc)."""
    px = np.asarray(px)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg wants (H,W,3) RGB or (H,W) gray")
    if subsampling not in ("444", "420", "422", "440"):
        raise NotImplementedError(
            f"subsampling {subsampling!r} "
            "(444, 420, 422, 440 supported)")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql, qc = _quality_tables(quality)

    if gray:
        planes = [px.astype(np.float64)]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]

    # luma sampling factors (hi, vi); chroma is always (1, 1)
    yfac = {"444": (1, 1), "420": (2, 2),
            "422": (2, 1), "440": (1, 2)}[subsampling]
    if gray:
        factors = [(1, 1)]
    elif yfac == (1, 1):
        factors = [(1, 1)] * 3
    else:
        factors = [yfac, (1, 1), (1, 1)]
        fh, fv = yfac

        # mean chroma downsample (box filter) over an edge-padded
        # plane, by the luma sampling ratio in each axis
        def down(p):
            pe = np.pad(p, ((0, -p.shape[0] % fv), (0, -p.shape[1] % fh)),
                        mode="edge")
            acc = np.zeros((pe.shape[0] // fv, pe.shape[1] // fh))
            for dy in range(fv):
                for dx in range(fh):
                    acc += pe[dy::fv, dx::fh]
            return acc / (fh * fv)
        planes = [planes[0], down(planes[1]), down(planes[2])]
    maxh = max(f[0] for f in factors)
    maxv = max(f[1] for f in factors)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    qtabs = [ql] + ([] if gray else [qc, qc])
    coeffs = [_block_coeffs(p, qt, mcuy * vi, mcux * hi)
              for p, qt, (hi, vi) in zip(planes, qtabs, factors)]
    return coeffs, factors, gray, h, w, mcux, mcuy, ql, qc


def _container_head(gray, h, w, factors, ql, qc, sof_marker,
                    ac_tables: bool = True) -> bytearray:
    """SOI .. SOF .. DHT segments (shared by baseline/progressive).
    ``ac_tables=False`` omits the Annex K AC tables — the progressive
    path redefines its AC table per scan (optimal DHTs), so shipping
    the baseline ones would be ~320 dead bytes per stream."""
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qc[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = factors[cid - 1]
        sof += struct.pack(">BBB", cid, (hi << 4) | vi,
                           0 if cid == 1 else 1)
    out += seg(sof_marker, sof)
    tabs = [((0 << 4) | 0, DC_LUMA_BITS, DC_LUMA_VALS)]
    if ac_tables:
        tabs.append(((1 << 4) | 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        tabs.append(((0 << 4) | 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        if ac_tables:
            tabs.append(((1 << 4) | 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    for tc_th, bits, vals in tabs:
        out += seg(0xFFC4, bytes([tc_th] + bits + vals))
    return out


def encode_jpeg(px: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale uint8 to baseline
    JPEG (Annex K tables at ``quality``).  ``subsampling``: "444"
    (one 8x8 block per component per MCU) or "420" (16x16 MCU: four
    Y blocks + one 2x2-mean-downsampled block each of Cb/Cr — the
    Common-Crawl/web norm, ~half the bytes of 4:4:4).  Deterministic:
    identical input → identical bytes."""
    (coeffs, factors, gray, h, w,
     mcux, mcuy, ql, qc) = _prepare(px, quality, subsampling)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tabs = [(dc_l, ac_l)] + ([] if gray else [(dc_c, ac_c)] * 2)

    bw = _BitWriter()
    preds = [0] * len(coeffs)
    for my in range(mcuy):
        for mx in range(mcux):      # interleaved MCU scan (B.2.3)
            for ci, ((dct, act), (hi, vi)) in enumerate(
                    zip(tabs, factors)):
                for dy in range(vi):
                    for dx in range(hi):
                        blk = coeffs[ci][my * vi + dy, mx * hi + dx]
                        preds[ci] = _write_block(bw, blk, preds[ci],
                                                 dct, act)

    # -- container ---------------------------------------------------
    out = _container_head(gray, h, w, factors, ql, qc, 0xFFC0)
    ncomp = 1 if gray else 3
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += b"\x00\x3F\x00"
    out += struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos
    out += bw.flush()
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# ------------------------------------------------- progressive encode
def _shift_to_zero(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): magnitude shift toward zero."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _NullBits:
    """Bit sink for the statistics pass (appended bits don't affect
    table optimization)."""

    def write(self, code: int, length: int) -> None:
        pass


class _ScanWriter:
    """One progressive scan's entropy stream: buffers EOB runs and
    (for refinement scans) the correction bits that must follow the
    next emitted Huffman symbol.  With ``act=None`` it runs in
    STATISTICS mode — symbols are tallied into ``freq`` so a
    per-scan optimal Huffman table (T.81 K.2) can be built, then the
    same emission code runs again with the real table (the two-pass
    structure progressive JPEG requires, since EOBn symbols are not
    in the Annex K baseline tables)."""

    def __init__(self, act: dict | None):
        self.act = act
        self.bw = _BitWriter() if act is not None else _NullBits()
        self.freq = [0] * 256
        self.eobrun = 0
        self.pending: list[int] = []

    def _emit_pending(self) -> None:
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def symbol(self, rs: int) -> None:
        if self.act is None:
            self.freq[rs] += 1
        else:
            code, ln = self.act[rs]
            self.bw.write(code, ln)

    def flush_eob(self) -> None:
        if self.eobrun == 0:
            self._emit_pending()
            return
        r = self.eobrun.bit_length() - 1
        self.symbol(r << 4)
        self.bw.write(self.eobrun - (1 << r), r)
        self.eobrun = 0
        self._emit_pending()

    def bump_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:   # EOBn caps at 2^14 extensions
            self.flush_eob()


def _optimal_table(freq256) -> tuple[list[int], list[int]]:
    """T.81 Annex K.2 optimal Huffman table generation (Figures
    K.1-K.4): merge the two least-frequent trees, limit code length
    to 16, reserve the all-ones code via the 257th symbol.  Returns
    (BITS[16], HUFFVAL)."""
    # vectorized K.1 merge loop (r7): the two least-frequent picks
    # were 2×257-entry python scans per merge (~130k iterations per
    # table) — argmin over a reversed masked array reproduces the
    # exact "ties -> LARGEST symbol value" rule in C speed
    freq = np.array(list(freq256) + [1], dtype=np.int64)
    freq[freq == 0] = np.iinfo(np.int64).max  # inactive sentinel
    codesize = [0] * 257
    others = [-1] * 257
    nactive = int(np.count_nonzero(freq != np.iinfo(np.int64).max))
    while nactive >= 2:
        rev = freq[::-1]
        c1 = 256 - int(np.argmin(rev))
        v1 = freq[c1]
        freq[c1] = np.iinfo(np.int64).max
        c2 = 256 - int(np.argmin(freq[::-1]))
        freq[c1] = v1 + freq[c2]
        freq[c2] = np.iinfo(np.int64).max
        nactive -= 1
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # limit to 16 bits (Figure K.3)
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1                    # drop the reserved all-ones code
    # symbols sorted by (code length, symbol) — stable argsort over
    # the 256 real symbols replaces the 8k-iteration nested listcomp
    cs = np.array(codesize[:256], dtype=np.int64)
    nz = np.flatnonzero(cs)
    huffval = nz[np.argsort(cs[nz], kind="stable")].tolist()
    return bits[1:17], huffval


def encode_jpeg_progressive(px: np.ndarray, quality: int = 90,
                            subsampling: str = "444") -> bytes:
    """Encode to PROGRESSIVE JPEG (SOF2, T.81 Annex G) with the
    standard successive-approximation scan script:

      1. DC, all components interleaved, Al=1
      2. DC refinement, Ah=1 -> Al=0
      3. per component: AC band 1-63 at Al=1 (EOB-run coded)
      4. per component: AC refinement Ah=1 -> Al=0

    The final image carries the identical quantized coefficients as
    ``encode_jpeg`` at the same quality/subsampling, so a full
    progressive decode is BIT-IDENTICAL to the baseline decode —
    the roundtrip test's oracle.  Deterministic output."""
    (coeffs, factors, gray, h, w,
     mcux, mcuy, ql, qc) = _prepare(px, quality, subsampling)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    ncomp = 1 if gray else 3
    dctabs = [dc_l] + [dc_c] * (ncomp - 1)
    actabs = [ac_l] + [ac_c] * (ncomp - 1)
    maxh = max(f[0] for f in factors)
    maxv = max(f[1] for f in factors)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos_header(comps_in_scan, ss, se, ah, al) -> bytes:
        body = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            td = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | td])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    out = _container_head(gray, h, w, factors, ql, qc, 0xFFC2,
                          ac_tables=False)

    # -- scan 1: DC first, interleaved, Al=1 -------------------------
    al = 1
    out += sos_header(list(range(ncomp)), 0, 0, 0, al)
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(factors):
                for dy in range(vi):
                    for dx in range(hi):
                        dc = int(coeffs[ci][my * vi + dy,
                                            mx * hi + dx, 0]) >> al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s = _magnitude(diff)
                        code, ln = dctabs[ci][s]
                        bw.write(code, ln)
                        if s:
                            v = diff if diff >= 0 else \
                                diff + (1 << s) - 1
                            bw.write(v, s)
    out += bw.flush()

    # -- scan 2: DC refinement, Ah=1 -> Al=0 -------------------------
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(factors):
                for dy in range(vi):
                    for dx in range(hi):
                        bw.write(int(coeffs[ci][my * vi + dy,
                                                mx * hi + dx, 0]) & 1,
                                 1)
    out += bw.flush()

    # real (non-MCU-padded) block grid per component — AC scans are
    # non-interleaved and cover only it (G.2; the padded blocks get
    # DC from the interleaved scans and stay AC-zero, then crop away)
    grids = []
    for ci, (hi, vi) in enumerate(factors):
        cw = -(-w * hi // maxh)
        ch = -(-h * vi // maxv)
        grids.append((-(-ch // 8), -(-cw // 8)))

    # -- scans 3..: AC first pass per component, Al=1 ----------------
    def emit_ac_first(sw, grid, nby, nbx, al):
        for by in range(nby):
            for bx in range(nbx):
                blk = grid[by, bx]
                t = [_shift_to_zero(int(blk[k]), al)
                     for k in range(1, 64)]
                nz = [i for i, v in enumerate(t) if v]
                if not nz:
                    sw.bump_eob()
                    continue
                sw.flush_eob()
                run, last = 0, nz[-1]
                for v in t[:last + 1]:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        sw.symbol(0xF0)           # ZRL
                        run -= 16
                    s = _magnitude(v)
                    sw.symbol((run << 4) | s)
                    ev = v if v >= 0 else v + (1 << s) - 1
                    sw.bw.write(ev, s)
                    run = 0
                if last < 62:
                    sw.bump_eob()
        sw.flush_eob()

    # the libjpeg jcphuff.c structure (a faithful rendering of T.81
    # Figure G.7): r counts ZERO-history positions only; ZRLs are
    # emitted eagerly when ANY nonzero temp is reached with r > 15
    # (before that coef's own bit), each followed by the correction
    # bits buffered so far — exactly the positional interleaving the
    # decoder's walk consumes
    def emit_ac_refine(sw, grid, nby, nbx):
        for by in range(nby):
            for bx in range(nbx):
                blk = grid[by, bx]
                temps = [abs(int(blk[k])) for k in range(64)]
                eob = 0             # last newly-significant index
                for k in range(1, 64):
                    if temps[k] == 1:
                        eob = k
                r = 0
                br_bits: list[int] = []
                for k in range(1, 64):
                    temp = temps[k]
                    if temp == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        sw.flush_eob()
                        sw.symbol(0xF0)           # ZRL
                        r -= 16
                        for b in br_bits:
                            sw.bw.write(b, 1)
                        br_bits = []
                    if temp > 1:    # history: one correction bit
                        br_bits.append(temp & 1)
                        continue
                    sw.flush_eob()  # newly significant (temp == 1)
                    sw.symbol((r << 4) | 1)
                    sw.bw.write(1 if int(blk[k]) > 0 else 0, 1)
                    for b in br_bits:
                        sw.bw.write(b, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    sw.eobrun += 1
                    sw.pending.extend(br_bits)
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eob()
        sw.flush_eob()

    # two passes per AC scan: tally symbols -> optimal table (the
    # Annex K baseline tables lack EOBn codes) -> DHT -> entropy
    def ac_scan(emit, ci, ss, se, ah, al) -> bytes:
        nby, nbx = grids[ci]
        stat = _ScanWriter(None)
        emit(stat, coeffs[ci], nby, nbx, *([al] if ah == 0 else []))
        bits, vals = _optimal_table(stat.freq)
        ta = 0 if ci == 0 else 1
        body = seg(0xFFC4, bytes([(1 << 4) | ta] + bits + vals))
        body += sos_header([ci], ss, se, ah, al)
        sw = _ScanWriter(_build_codes(bits, vals))
        emit(sw, coeffs[ci], nby, nbx, *([al] if ah == 0 else []))
        return body + sw.bw.flush()

    for ci in range(ncomp):
        out += ac_scan(emit_ac_first, ci, 1, 63, 0, 1)
    for ci in range(ncomp):
        out += ac_scan(emit_ac_refine, ci, 1, 63, 1, 0)

    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode
class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers;
    restart markers (RST0-7) reset the stream byte-aligned."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _Restart(self.pos)
            else:
                raise ValueError(
                    f"marker 0x{b:02X}{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        # mask consumed high bits before shifting: without it acc
        # grows 8 bits per fill forever (a Python bigint), making
        # every shift/extract O(scan bytes) — quadratic on long scans
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def realign(self, pos: int) -> None:
        self.pos = pos + 2          # skip the RSTn marker
        self.acc = 0
        self.nbits = 0


class _Restart(Exception):
    def __init__(self, pos):
        self.pos = pos


_DECODE_LUT_CACHE: dict = {}


def _decode_lut(bits, vals) -> tuple[list[int], int]:
    """Flat peek-L lookup table for canonical Huffman decode: entry
    at every L-bit index whose top bits equal a code holds
    ``(symbol << 5) | code_length`` (0 = no code).  L is the table's
    real max code length, so tiny optimal tables stay tiny.  Cached
    by table bytes — the Annex K default tables recur for every
    baseline image, and their 16-bit depth makes the 65k-entry build
    the dominant decode cost if repeated per image."""
    key = (bytes(bits), bytes(vals))
    hit = _DECODE_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    maxlen = 0
    for i in range(16):
        if bits[i]:
            maxlen = i + 1
    maxlen = max(maxlen, 1)
    table = [0] * (1 << maxlen)
    code, k = 0, 0
    for length in range(1, maxlen + 1):
        for _ in range(bits[length - 1]):
            v = vals[k]
            k += 1
            span = 1 << (maxlen - length)
            base = code << (maxlen - length)
            table[base:base + span] = [(v << 5) | length] * span
            code += 1
        code <<= 1
    if len(_DECODE_LUT_CACHE) > 512:   # bound worker memory
        _DECODE_LUT_CACHE.clear()
    _DECODE_LUT_CACHE[key] = (table, maxlen)
    return table, maxlen


def _huff_decode(br: _BitReader, lut: tuple[list[int], int]) -> int:
    """One peek-L table probe instead of the old bit-by-bit walk
    (which paid a dict lookup + bits(1) per code bit).  Fill order is
    identical to the incremental walk: a byte is pulled only when no
    complete code resolves from the bits already buffered, so marker
    and restart behavior is unchanged."""
    table, L = lut
    while True:
        avail = br.nbits
        if avail >= L:
            e = table[(br.acc >> (avail - L)) & ((1 << L) - 1)]
            if e:
                br.nbits = avail - (e & 0x1F)
                return e >> 5
            raise ValueError("invalid Huffman code in entropy data")
        if avail:
            # zero-pad the peek; trust it only if the resolved code
            # fits inside the real bits
            e = table[(br.acc << (L - avail)) & ((1 << L) - 1)]
            if e and (e & 0x1F) <= avail:
                br.nbits = avail - (e & 0x1F)
                return e >> 5
        br._fill()


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips
    entropy bytes and stuffed 0xFF00)."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00,):
            return pos
        pos += 1
    raise ValueError("ran off the end looking for a marker")


# ------------------------------------------------- progressive decode
class _ProgressiveState:
    """Per-image coefficient accumulators for SOF2 multi-scan decode
    (T.81 G.2): each scan deposits another slice of (spectral band x
    bit precision) into the per-component zigzag coefficient grids."""

    def __init__(self, comps, h, w):
        self.meta = {cid: (tq, hi, vi) for cid, tq, hi, vi in comps}
        self.maxh = max(hi for _, _, hi, _ in comps)
        self.maxv = max(vi for _, _, _, vi in comps)
        self.mcux = -(-w // (8 * self.maxh))
        self.mcuy = -(-h // (8 * self.maxv))
        self.coef = {}
        self.nblocks = {}           # per-comp REAL (nby, nbx)
        for cid, _tq, hi, vi in comps:
            self.coef[cid] = np.zeros(
                (self.mcuy * vi, self.mcux * hi, 64), np.int32)
            cw = -(-w * hi // self.maxh)
            ch = -(-h * vi // self.maxv)
            self.nblocks[cid] = (-(-ch // 8), -(-cw // 8))


def _prog_dc_scan(br, st, scan, huff, Ah, Al, dri):
    """DC scan, interleaved or single-component (G.2 first pass when
    Ah == 0, else one refinement bit per block)."""
    preds = {cid: 0 for cid, _, _ in scan}

    def block(cid, td, by, bx):
        blk = st.coef[cid]
        if Ah == 0:
            s = _huff_decode(br, huff[(0, td)])
            diff = _extend(br.bits(s), s) if s else 0
            preds[cid] += diff
            blk[by, bx, 0] = preds[cid] << Al
        elif br.bits(1):
            blk[by, bx, 0] |= (1 << Al)

    if len(scan) > 1:               # interleaved MCU order
        mcu = 0
        for my in range(st.mcuy):
            for mx in range(st.mcux):
                if dri and mcu and mcu % dri == 0:
                    _prog_restart(br, preds)
                for cid, td, _ta in scan:
                    _tq, hi, vi = st.meta[cid]
                    for dy in range(vi):
                        for dx in range(hi):
                            block(cid, td, my * vi + dy, mx * hi + dx)
                mcu += 1
    else:
        cid, td, _ta = scan[0]
        nby, nbx = st.nblocks[cid]
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if dri and n and n % dri == 0:
                    _prog_restart(br, preds)
                block(cid, td, by, bx)
                n += 1


def _prog_restart(br, preds):
    try:
        while True:
            br.bits(1)
    except _Restart as r:
        br.realign(r.pos)
    for k in preds:
        preds[k] = 0


def _prog_ac_scan(br, st, scan, huff, Ss, Se, Ah, Al, dri):
    """AC scan (single component only, per G.2): first pass decodes
    magnitudes at precision Al with EOB-run codes; refinement passes
    add one bit to known coefficients and introduce new +-1<<Al."""
    if len(scan) != 1:
        raise ValueError("interleaved AC scan is not legal JPEG")
    cid, _td, ta = scan[0]
    blkgrid = st.coef[cid]
    nby, nbx = st.nblocks[cid]
    eobrun = 0
    n = 0
    for by in range(nby):
        for bx in range(nbx):
            if dri and n and n % dri == 0:
                _prog_restart(br, {})
                eobrun = 0
            n += 1
            blk = blkgrid[by, bx]
            if Ah == 0:             # ---------------- first pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = Ss
                while k <= Se:
                    rs = _huff_decode(br, huff[(1, ta)])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > Se:
                        raise ValueError("AC run past band end")
                    blk[k] = _extend(br.bits(s), s) << Al
                    k += 1
            else:                   # ---------------- refinement
                p1, m1 = 1 << Al, -1 << Al
                k = Ss
                if eobrun == 0:
                    while k <= Se:
                        rs = _huff_decode(br, huff[(1, ta)])
                        r, s = rs >> 4, rs & 0xF
                        newval = 0
                        if s == 0:
                            if r < 15:
                                # counts the CURRENT block too — its
                                # tail is corrected below, then the
                                # run is decremented for it
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: skip 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad magnitude in AC refinement")
                            newval = p1 if br.bits(1) else m1
                        while k <= Se:
                            if blk[k] != 0:
                                if br.bits(1) and (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= Se:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:      # EOB region: corrections only
                    while k <= Se:
                        if blk[k] != 0:
                            if br.bits(1) and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] > 0 else m1
                        k += 1
                    eobrun -= 1


def _decode_progressive(blob, pos, st, qt, huff, dri):
    """Drive every scan of a SOF2 stream (DHT/DRI may be redefined
    between scans); returns when EOI is reached."""
    while True:
        pos = _next_marker(blob, pos)
        marker = struct.unpack_from(">H", blob, pos)[0]
        if marker == 0xFFD9:        # EOI
            return
        if 0xFFD0 <= marker <= 0xFFD7 or marker == 0xFF01:
            pos += 2                # stray RST/TEM between scans
            continue
        ln = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4:pos + 2 + ln]
        if marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, vals)
                off += 17 + nv
        elif marker == 0xFFDD:
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tt >> 4, tt & 0xF))
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            AhAl = body[3 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 0xF
            br = _BitReader(blob, pos + 2 + ln)
            if Ss == 0:
                if Se != 0:
                    raise ValueError("DC scan with Se != 0")
                _prog_dc_scan(br, st, scan, huff, Ah, Al, dri)
            else:
                _prog_ac_scan(br, st, scan, huff, Ss, Se, Ah, Al, dri)
            pos = _next_marker(blob, br.pos)
            continue
        pos = pos + 2 + ln


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode baseline JPEG to (H, W, 3) uint8 RGB (grayscale is
    replicated).  Subset limits raise ``NotImplementedError``
    naming the unsupported feature."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}    # (tclass, tid) -> {(code,len): val}
    comps: list = []                # (cid, tq, hi, vi)
    scan: list = []                 # (cid, td, ta)
    h = w = 0
    restart = 0
    progressive = False
    sos_pos = -1
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = struct.unpack_from(">H", blob, pos)[0]
        if marker == 0xFFD9:
            raise ValueError("EOI before SOS")
        ln = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4:pos + 2 + ln]
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(body, np.uint8, 64, off + 1)
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = tab    # stream order is zigzag
                qt[tq] = nat
                off += 65
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = list(body[off + 17:off + 17 + n])
                huff[(tc, th)] = _decode_lut(bits, vals)
                off += 17 + n
        elif marker in (0xFFC0, 0xFFC2):
            progressive = marker == 0xFFC2
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} (1 and 2 "
                        "supported: 4:4:4, 4:2:0, 4:2:2, 4:4:0)")
                comps.append((cid, tq, hi, vi))
        elif marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"non-baseline SOF 0x{marker:04X} (arithmetic/"
                "lossless/12-bit) not supported")
        elif marker == 0xFFDD:
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:
            if progressive:
                sos_pos = pos       # hand the whole scan chain over
                break
            ns = body[0]
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tt >> 4, tt & 0xF))
            pos = pos + 2 + ln
            break
        pos = pos + 2 + ln
    if not comps or h == 0 or (not scan and not progressive):
        raise ValueError("missing SOF/SOS")
    if progressive:
        st = _ProgressiveState(comps, h, w)
        _decode_progressive(blob, sos_pos, st, qt, huff, restart)
        factors = [(hi, vi) for _cid, _tq, hi, vi in comps]
        maxh = st.maxh
        maxv = st.maxv
        planes = []
        for cid, tq, hi, vi in comps:
            grid = st.coef[cid]             # (nby, nbx, 64) zigzag
            nby, nbx = grid.shape[:2]
            nat = np.zeros_like(grid)
            nat[..., ZIGZAG] = grid         # dezigzag
            deq = (nat * qt[tq][None, None, :]).astype(float)
            blocks = deq.reshape(-1, 8, 8)
            sp = _D.T @ blocks @ _D + 128.0  # batched 2-D IDCT
            planes.append(sp.reshape(nby, nbx, 8, 8)
                          .transpose(0, 2, 1, 3)
                          .reshape(nby * 8, nbx * 8))
        return _finish_planes(planes, factors, maxh, maxv, h, w)
    if len(scan) != len(comps):
        raise NotImplementedError(
            "multi-scan sequential streams not supported")
    if len(scan) == 1 and any((hi, vi) != (1, 1)
                              for _cid, _tq, hi, vi in comps):
        # T.81 A.2.2: a single-component (non-interleaved) scan walks
        # the component's own ceil(w/8)×ceil(h/8) block grid, not the
        # interleaved MCU geometry below — refuse loudly rather than
        # mis-decode (ADVICE r6)
        raise NotImplementedError(
            "single-component sequential scan with sampling factors "
            "!= 1x1 not supported")

    meta = {cid: (tq, hi, vi) for cid, tq, hi, vi in comps}
    maxh = max(hi for _, _, hi, _ in comps)
    maxv = max(vi for _, _, _, vi in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    factors = [meta[cid][1:] for cid, _, _ in scan]
    planes = [np.zeros((mcuy * vi * 8, mcux * hi * 8))
              for hi, vi in factors]
    br = _BitReader(blob, pos)
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):      # interleaved MCU scan (B.2.3)
            if restart and mcu and mcu % restart == 0:
                # encoder-aligned restart: skip to the RSTn marker
                try:
                    while True:
                        br.bits(1)
                except _Restart as r:
                    br.realign(r.pos)
                preds = [0] * len(comps)
            for ci, (cid, td, ta) in enumerate(scan):
                hi, vi = factors[ci]
                for dy in range(vi):
                    for dx in range(hi):
                        try:
                            blk = np.zeros(64, np.int32)
                            s = _huff_decode(br, huff[(0, td)])
                            diff = _extend(br.bits(s), s) if s else 0
                            preds[ci] += diff
                            blk[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(br, huff[(1, ta)])
                                r_, s_ = rs >> 4, rs & 0xF
                                if s_ == 0:
                                    if r_ == 15:
                                        k += 16
                                        continue
                                    break             # EOB
                                k += r_
                                if k > 63:
                                    raise ValueError(
                                        "AC run past block end")
                                blk[k] = _extend(br.bits(s_), s_)
                                k += 1
                        except _Restart as r:
                            br.realign(r.pos)
                            preds = [0] * len(comps)
                            raise ValueError(
                                "restart marker mid-MCU (corrupt "
                                "stream)")
                        nat = np.zeros(64, np.int32)
                        nat[ZIGZAG] = blk
                        deq = (nat * qt[meta[cid][0]]).reshape(8, 8) \
                            .astype(float)
                        sp = _D.T @ deq @ _D + 128.0
                        by, bx = my * vi + dy, mx * hi + dx
                        planes[ci][by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8] = sp
            mcu += 1

    return _finish_planes(planes, factors, maxh, maxv, h, w)


def _finish_planes(planes, factors, maxh, maxv, h, w) -> np.ndarray:
    """Shared decode tail: replicated-pixel chroma upsample (the box
    filter matching the encoder's mean downsample), crop, YCbCr →
    RGB (gray replicated to 3 channels)."""
    up = []
    for p, (hi, vi) in zip(planes, factors):
        if hi != maxh:
            p = np.repeat(p, maxh // hi, axis=1)
        if vi != maxv:
            p = np.repeat(p, maxv // vi, axis=0)
        up.append(p[:h, :w])
    planes = up
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
