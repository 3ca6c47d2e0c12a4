"""JPEG codec (baseline + progressive) in numpy + stdlib — no PIL.

The dominant real-corpus image format gets an in-repo decode path:
baseline sequential DCT and progressive DCT (spectral selection +
successive approximation, T.81 Annex G — the large share of web JPEGs),
8-bit, grayscale or YCbCr, any 1-2× chroma subsampling (4:4:4 / 4:2:2 /
4:2:0), restart markers, EOBn run coding. Arithmetic-coded, lossless
and hierarchical processes raise ``NotImplementedError`` and stay
behind the PIL import-gate in ``multimodal._decode_compressed``.

Everything here follows the public ITU-T T.81 spec (the JPEG standard):
Annex K's example Huffman tables ride in the ENCODER's DHT segments and
the decoder always builds its tables from the stream's own DHT — so the
decoder is spec-driven, not constant-driven. The encoder exists mainly
so the decoder is testable round-trip in this sandbox (PIL is absent);
it writes interleaved baseline scans with optional 4:2:0 subsampling
and restart intervals, the common shape of real camera/web output.

The per-blob work is plain Python+numpy on purpose: decode parallelism
at corpus scale comes from Spark (Arrow-batched ``mapInPandas`` over
the binary column, operators/multimodal.py), not from this codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag position -> raster index within the 8x8 block (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.3 example Huffman tables: (bits[1..16], values)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


def _canonical_codes(bits, vals):
    """symbol -> (length, code) by T.81 canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


def _decoder_table(bits, vals):
    """(length, code) -> symbol."""
    return {lc: sym for sym, lc in _canonical_codes(bits, vals).items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc & 0xFF
                self.buf.append(b)
                if b == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:  # pad with 1-bits to a byte boundary
        while self._n:
            self.write(1, 1)


def _encode_block(out, block, quant, dc_codes, ac_codes, pred):
    coef = _DCT @ (block - 128.0) @ _DCT.T
    q = np.rint(coef / quant).astype(np.int64)
    zz = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    s = _category(diff)
    length, code = dc_codes[s]
    out.write(code, length)
    if s:
        out.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            out.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_codes[(run << 4) | s]
        out.write(code, length)
        out.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = ac_codes[0x00]  # EOB
        out.write(code, length)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of a (h, w[, 1|3]) uint8 image.

    ``quant`` scales a FLAT quantization table (1 = near-lossless —
    round-trip error is DCT rounding only, a pixel or two). ``subsample``
    writes 4:2:0 (2×2 luma per MCU, chroma averaged), the common
    real-world layout; ``restart_interval`` > 0 emits DRI + RSTn every
    that many MCUs. RGB input goes through JFIF YCbCr.
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_baseline: 1 or 3 channels")
    if not 1 <= quant <= 255 or int(quant) != quant:
        # a baseline 8-bit DQT entry is an INTEGER in [1, 255]: emitting
        # a rounded/clamped table while quantizing by the raw value
        # would produce a stream every decoder dequantizes WRONG
        raise ValueError(
            "quant must be an integer in [1, 255] (baseline 8-bit DQT)"
        )
    qt = np.full((8, 8), float(quant))

    if nc == 3:
        rgb = pixels.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        planes = [y, cb, cr]
    else:
        planes = [pixels[..., 0].astype(np.float64)]

    lu = (2, 2) if (nc == 3 and subsample) else (1, 1)
    sampling = [lu] + [(1, 1)] * (nc - 1)
    max_h = max(s[0] for s in sampling)
    max_v = max(s[1] for s in sampling)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    comp_planes = []
    for i, (p, (sh, sv)) in enumerate(zip(planes, sampling)):
        if (sh, sv) != (max_h, max_v):
            # box-average downsample by the integer factor
            fx, fy = max_h // sh, max_v // sv
            ph = _pad_to_blocks(p, -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx)
            p = ph.reshape(ph.shape[0] // fy, fy, ph.shape[1] // fx, fx).mean(axis=(1, 3))
        comp_planes.append(_pad_to_blocks(p, mcus_y * sv * 8, mcus_x * sh * 8))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0]) + bytes(int(qt.flat[ZIGZAG[i]]) for i in range(64))
    out += _seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += _seg(0xFFC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUMA), (1, 0, AC_LUMA), (0, 1, DC_CHROMA), (1, 1, AC_CHROMA),
    ):
        out += _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    dc_codes = [_canonical_codes(*DC_LUMA)] + [_canonical_codes(*DC_CHROMA)] * (nc - 1)
    ac_codes = [_canonical_codes(*AC_LUMA)] + [_canonical_codes(*AC_CHROMA)] * (nc - 1)
    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out_chunk = bytes(bw.buf)
                out += out_chunk + bytes([0xFF, 0xD0 + (rst % 8)])
                bw = _BitWriter()
                rst += 1
                preds = [0] * nc
            for ci in range(nc):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = comp_planes[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qt, dc_codes[ci], ac_codes[ci], preds[ci]
                        )
            mcu_count += 1
    bw.flush()
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------- progressive encoder
#
# Exists so the progressive DECODER is testable round-trip without PIL
# (same reason the baseline encoder exists). Writes a spectral-selection
# + successive-approximation scan script: DC first (Al=1) → DC refine →
# per-component AC first scans in TWO spectral bands (Al=1) → the
# matching AC refinement scans — exercising every progressive scan kind,
# EOBn run coding included. Tables are FLAT canonical Huffman codes (all
# 256 AC symbols at 9 bits, 16 DC symbols at 5 bits): Annex K's baseline
# tables lack the EOBn symbols (0x10..0xE0) progressive needs, and a
# flat table is trivially Kraft-valid — compression is not the point.

_DC_FLAT = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
# 255 symbols at 9 bits + 1 at 10 (a DHT BITS entry is one byte, so a
# single length caps at 255 codes); Kraft sum 255/512 + 1/1024 < 1
_AC_FLAT = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


class _ProgACWriter:
    """Per-scan AC emitter with EOBn run accumulation (mirrors the
    public libjpeg encode_mcu_AC_* structure)."""

    def __init__(self, bw: _BitWriter, codes):
        self.bw = bw
        self.codes = codes
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits awaiting a symbol

    def sym(self, rs: int) -> None:
        length, code = self.codes[rs]
        self.bw.write(code, length)

    def flush_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def bump_eobrun(self, block_bits: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(block_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _encode_ac_first(w: _ProgACWriter, band_vals: list[int]) -> None:
    run = 0
    for t in band_vals:
        if t == 0:
            run += 1
            continue
        w.flush_eobrun()
        while run > 15:
            w.sym(0xF0)
            run -= 16
        s = _category(t)
        w.sym((run << 4) | s)
        w.bw.write(t if t > 0 else t + (1 << s) - 1, s)
        run = 0
    if run:  # trailing zeros → this block joins the EOB run
        w.bump_eobrun([])


def _encode_ac_refine(w: _ProgACWriter, vals: list[int], al: int) -> None:
    """vals = the band's RAW coefficients (natural sign). Mirrors the
    spec's figure G.7 flow: the zero run counts only ZERO-HISTORY
    positions; correction bits for already-significant coefficients
    buffer until the next emitted symbol (ZRL / newly-significant /
    EOBn) so the decoder's traversal reads them in position order."""
    absv = [abs(v) >> al for v in vals]
    run = 0
    br: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        # ZRLs are due at ANY nonzero position once 16 zero-history
        # slots accumulated — deferring them past a correction
        # coefficient would put its bit on the wrong side of the symbol
        while run > 15:
            w.flush_eobrun()
            w.sym(0xF0)
            run -= 16
            for b in br:
                w.bw.write(b, 1)
            br = []
        if a > 1:  # already significant: one correction bit
            br.append(a & 1)
            continue
        # newly significant (magnitude exactly 1 at this bit plane)
        w.flush_eobrun()
        w.sym((run << 4) | 1)
        w.bw.write(1 if vals[i] > 0 else 0, 1)
        for b in br:
            w.bw.write(b, 1)
        br = []
        run = 0
    if run or br:
        w.bump_eobrun(br)


def _rst(out: bytearray, bw: _BitWriter, rst_i: int) -> _BitWriter:
    """Flush the entropy segment, emit RSTn, hand back a fresh writer."""
    bw.flush()
    out += bytes(bw.buf)
    out += bytes([0xFF, 0xD0 + rst_i % 8])
    return _BitWriter()


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JFIF encode of a (h, w[, 1|3]) uint8 image.

    Same pixel semantics as :func:`encode_jpeg_baseline` — the scans
    carry the identical DCT coefficients, split by spectral band and
    one successive-approximation bit plane — so a decoder must
    reproduce the baseline round-trip within the same tolerance.
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs
    (interleaved DC scans) / blocks (non-interleaved scans), with the
    spec's per-interval resets: DC predictors, and EOB runs flushed so
    they never cross a restart boundary.
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_progressive: 1 or 3 channels")
    if not 1 <= quant <= 255 or int(quant) != quant:
        raise ValueError("quant must be an integer in [1, 255]")
    qt = np.full((8, 8), float(quant))

    if nc == 3:
        rgb = pixels.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        planes = [y, cb, cr]
    else:
        planes = [pixels[..., 0].astype(np.float64)]

    lu = (2, 2) if (nc == 3 and subsample) else (1, 1)
    sampling = [lu] + [(1, 1)] * (nc - 1)
    max_h = max(s[0] for s in sampling)
    max_v = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))

    # quantized coefficient arrays per component, zigzag order — the
    # scans below re-read these; DCT runs once
    comp_coefs = []
    comp_dims = []
    for p, (sh, sv) in zip(planes, sampling):
        if (sh, sv) != (max_h, max_v):
            fx, fy = max_h // sh, max_v // sv
            ph = _pad_to_blocks(p, -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx)
            p = ph.reshape(ph.shape[0] // fy, fy, ph.shape[1] // fx, fx).mean(axis=(1, 3))
        full = _pad_to_blocks(p, mcus_y * sv * 8, mcus_x * sh * 8)
        by, bx = full.shape[0] // 8, full.shape[1] // 8
        blocks = full.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,yxjk,kl->yxil", _DCT, blocks - 128.0, _DCT.T)
        q = np.rint(coef.reshape(by, bx, 64) / qt.reshape(64)).astype(np.int64)
        comp_coefs.append(q[..., np.array(ZIGZAG)])  # natural → zigzag order
        comp_dims.append((by, bx))

    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xFFDB, bytes([0]) + bytes(int(qt.flat[ZIGZAG[i]]) for i in range(64))
    )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += _seg(0xFFC2, sof)  # SOF2: progressive DCT
    for cls, tid, (bits, vals) in ((0, 0, _DC_FLAT), (1, 0, _AC_FLAT)):
        out += _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    dc_codes = _canonical_codes(*_DC_FLAT)
    ac_codes = _canonical_codes(*_AC_FLAT)

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0])  # DC and AC table 0 for every scan
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, body)

    # --- scan 1: DC first, interleaved, Al=1 (arithmetic shift, G.1.2.1)
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    rst_i = 0
    for n_mcu, (my, mx) in enumerate(
        (my, mx) for my in range(mcus_y) for mx in range(mcus_x)
    ):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            bw = _rst(out, bw, rst_i)
            rst_i += 1
            preds = [0] * nc
        for ci in range(nc):
            sh, sv = sampling[ci]
            for by in range(sv):
                for bx in range(sh):
                    v = int(comp_coefs[ci][my * sv + by, mx * sh + bx, 0]) >> 1
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = _category(diff)
                    length, code = dc_codes[s]
                    bw.write(code, length)
                    if s:
                        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += bytes(bw.buf)

    # --- scan 2: DC refinement, Al=0 (raw bits, no Huffman)
    out += sos_header(list(range(1, nc + 1)), 0, 0, 1, 0)
    bw = _BitWriter()
    rst_i = 0
    for n_mcu, (my, mx) in enumerate(
        (my, mx) for my in range(mcus_y) for mx in range(mcus_x)
    ):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            bw = _rst(out, bw, rst_i)
            rst_i += 1
        for ci in range(nc):
            sh, sv = sampling[ci]
            for by in range(sv):
                for bx in range(sh):
                    bw.write(int(comp_coefs[ci][my * sv + by, mx * sh + bx, 0]) & 1, 1)
    bw.flush()
    out += bytes(bw.buf)

    # --- AC scans: two spectral bands per component, first then refine
    bands = [(1, 5), (6, 63)]

    def comp_scan_blocks(ci):
        sh, sv = sampling[ci]
        cw = -(-w * sh // max_h)
        ch = -(-h * sv // max_v)
        rows, cols = -(-ch // 8), -(-cw // 8)
        for by in range(rows):
            for bx in range(cols):
                yield comp_coefs[ci][by, bx]

    def ac_scan(ci: int, ss: int, se: int, refine: bool) -> None:
        bw = _BitWriter()
        wtr = _ProgACWriter(bw, ac_codes)
        rst_i = 0
        for n_blk, zz in enumerate(comp_scan_blocks(ci)):
            if restart_interval and n_blk and n_blk % restart_interval == 0:
                # EOB runs may not cross a restart boundary
                wtr.flush_eobrun()
                wtr.bw = bw = _rst(out, wtr.bw, rst_i)
                rst_i += 1
            if refine:
                _encode_ac_refine(wtr, [int(v) for v in zz[ss:se + 1]], 0)
            else:
                band = [
                    int(v) // 2 if v >= 0 else -((-int(v)) >> 1)
                    for v in zz[ss:se + 1]
                ]
                _encode_ac_first(wtr, band)
        wtr.flush_eobrun()
        wtr.bw.flush()
        out.extend(wtr.bw.buf)  # .extend: += would shadow `out` as local

    for ss, se in bands:
        for ci in range(nc):
            out += sos_header([ci + 1], ss, se, 0, 1)
            ac_scan(ci, ss, se, refine=False)
    for ss, se in bands:
        for ci in range(nc):
            out += sos_header([ci + 1], ss, se, 1, 0)
            ac_scan(ci, ss, se, refine=True)

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Byte-align and consume the next RSTn marker."""
        self._n = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("missing restart marker")
        self.pos += 2


def _read_huff(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def peek_dims(data: bytes) -> tuple[int, int, int]:
    """(height, width, channels) from any JPEG's SOF marker — cheap
    metadata without a full decode (works for progressive too).
    Truncated/corrupt streams raise ValueError, never a raw
    struct.error/IndexError (a corpus blob must not fail a whole
    mapInPandas task opaquely)."""
    try:
        return _peek_dims(data)
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated or corrupt JPEG stream") from exc


def _peek_dims(data: bytes) -> tuple[int, int, int]:
    pos = 2
    while pos < len(data) - 3:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill byte, skip one
            pos += 1
            continue
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return h, w, data[pos + 9]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        pos += 2 + seg_len
    raise ValueError("no SOF marker found")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline OR progressive JPEG to an (h, w, c) uint8 array.

    Arithmetic-coded / lossless / hierarchical processes (SOF3, SOF9+)
    raise ``NotImplementedError`` — multimodal's PIL import-gate stays
    the answer for those rare profiles in this sandbox.
    """
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated or corrupt JPEG stream") from exc
    except KeyError as exc:  # scan references an undefined DQT/DHT id
        raise ValueError(f"JPEG stream references undefined table {exc}") from exc


# kept under its round-7 name for callers/tests of the baseline profile;
# since round 8 it decodes progressive streams too (same coefficients,
# different scan structure)
decode_jpeg_baseline = decode_jpeg


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] | None = None  # progressive accumulation
    while True:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill byte, skip one
            pos += 1
            continue
        if marker == 0x00:  # stuffed byte in residual entropy data
            pos += 2
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            if (
                frame is not None
                and frame.get("progressive")
                and frame.get("n_scans", 0) > 0
            ):
                return _reconstruct_progressive(frame, coefs, qt)
            raise ValueError("no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seg_len]
        end = pos + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                n = 64 * (2 if pq else 1)
                raw = body[b + 1:b + 1 + n]
                vals = (
                    struct.unpack(f">{64}H", raw) if pq else list(raw)
                )
                t = np.zeros(64)
                for i in range(64):
                    t[ZIGZAG[i]] = vals[i]
                qt[tq] = t.reshape(8, 8)
                b += 1 + n
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                huff[(tc, th)] = _decoder_table(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            precision, h, w, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
            if marker == 0xC2:
                max_h = max(c["h"] for c in comps)
                max_v = max(c["v"] for c in comps)
                frame["max_h"], frame["max_v"] = max_h, max_v
                frame["mcus_x"] = -(-w // (8 * max_h))
                frame["mcus_y"] = -(-h // (8 * max_v))
                # per-component coefficient buffers, ZIGZAG order in the
                # last axis — every scan refines these until EOI
                coefs = [
                    np.zeros(
                        (frame["mcus_y"] * c["v"], frame["mcus_x"] * c["h"], 64),
                        dtype=np.int32,
                    )
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG process (lossless/arithmetic/hierarchical): "
                "decode needs PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                ci, comp = next(
                    (j, c) for j, c in enumerate(frame["comps"]) if c["id"] == cid
                )
                scan.append((comp, tabs >> 4, tabs & 15, ci))
            if frame.get("progressive"):
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah_al = body[3 + 2 * ns]
                pos = _decode_progressive_scan(
                    data, end, frame, scan, huff, restart_interval, coefs,
                    ss, se, ah_al >> 4, ah_al & 15,
                )
                frame["n_scans"] = frame.get("n_scans", 0) + 1
                continue
            return _decode_scan(
                data, end, frame, [s[:3] for s in scan], qt, huff, restart_interval
            )
        pos = end


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_index = my * mcus_x + mx
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.restart(rst % 8)
                rst += 1
                preds = [0] * len(comps)
            for ci, (comp, dc_t, ac_t) in enumerate(scan):
                quant = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64)
                        s = _read_huff(reader, huff[(0, dc_t)])
                        diff = _extend(reader.receive(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huff(reader, huff[(1, ac_t)])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coef = np.zeros(64)
                        for i in range(64):
                            coef[ZIGZAG[i]] = zz[i]
                        block = coef.reshape(8, 8) * quant
                        pix = _DCT.T @ block @ _DCT + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    return _finish_planes(planes, comps, max_h, max_v, h, w)


# ------------------------------------------------- progressive decoding
#
# T.81 Annex G: a progressive frame carries the SAME coefficients as a
# baseline one, split across scans by spectral band (Ss..Se) and bit
# plane (successive approximation Ah/Al). Decoding accumulates into
# per-component coefficient buffers; the IDCT runs once at EOI.


def _comp_scan_dims(frame, comp) -> tuple[int, int]:
    """Block grid of a NON-interleaved scan for this component (G.1):
    ceil over the component's own sample dimensions, not the padded MCU
    grid — the trailing MCU-padding blocks carry no coded data."""
    cw = -(-frame["w"] * comp["h"] // frame["max_h"])
    ch = -(-frame["h"] * comp["v"] // frame["max_v"])
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(
    data, pos, frame, scan, huff, restart_interval, coefs, ss, se, ah, al
):
    """Decode one progressive scan into ``coefs``; returns the stream
    position after its entropy data. Four scan kinds (DC/AC ×
    first/refinement); interleaved scans are DC-only per G.1.1.1.1."""
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    eobrun = 0
    if len(scan) == 1 and ss > 0:  # AC scan: always single-component
        comp, _dc_t, ac_t, ci = scan[0]
        rows, cols = _comp_scan_dims(frame, comp)
        table = huff[(1, ac_t)]
        n = 0
        for by in range(rows):
            for bx in range(cols):
                if restart_interval and n and n % restart_interval == 0:
                    reader.restart((n // restart_interval - 1) % 8)
                    eobrun = 0
                block = coefs[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first(reader, block, table, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, block, table, ss, se, al, eobrun)
                n += 1
        return reader.pos
    if ss != 0 or se != 0:
        raise ValueError("interleaved progressive scan must be DC-only")
    # DC scan: interleaved MCU order (or single-component block order)
    if len(scan) == 1:
        comp, dc_t, _ac_t, ci = scan[0]
        rows, cols = _comp_scan_dims(frame, comp)
        units = [(ci, by, bx) for by in range(rows) for bx in range(cols)]
        groups = [[u] for u in units]
        tables = {ci: huff[(0, dc_t)]} if ah == 0 else {ci: None}
    else:
        groups = []
        tables = {}
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                g = []
                for comp, dc_t, _ac_t, ci in scan:
                    tables[ci] = huff[(0, dc_t)] if ah == 0 else None
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            g.append((ci, my * comp["v"] + by, mx * comp["h"] + bx))
                groups.append(g)
    ci_to_slot = {s[3]: i for i, s in enumerate(scan)}
    for n, group in enumerate(groups):
        if restart_interval and n and n % restart_interval == 0:
            reader.restart((n // restart_interval - 1) % 8)
            preds = [0] * len(scan)
        for ci, by, bx in group:
            block = coefs[ci][by, bx]
            if ah == 0:
                slot = ci_to_slot[ci]
                s = _read_huff(reader, tables[ci])
                diff = _extend(reader.receive(s), s) if s else 0
                preds[slot] += diff
                block[0] = preds[slot] << al
            elif reader.read_bit():
                block[0] |= 1 << al
    return reader.pos


def _ac_first(reader, block, table, ss, se, al, eobrun) -> int:
    """First AC scan for one block (G.1.2.2): magnitudes at bit plane
    ``al``, zero runs + EOBn run-length coding across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff(reader, table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                run = (1 << r) - 1
                if r:
                    run += reader.receive(r)
                return run
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band end")
        block[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, block, table, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (G.1.2.3): one correction bit
    per already-significant coefficient, newly-significant ±1<<al
    insertions between them."""
    p1 = 1 << al
    m1 = -p1

    def correct(k: int) -> None:
        v = int(block[k])
        if reader.read_bit() and not (v & p1):
            block[k] = v + (p1 if v >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_huff(reader, table)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                newval = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                break  # EOB path handles the band tail below
            # advance past r zero-HISTORY coefficients, emitting
            # correction bits for the nonzero-history ones on the way
            while k <= se:
                if block[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("AC refinement run past band end")
                block[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficients (one vectorized
    pass per component), then the shared upsample/crop/color tail."""
    comps = frame["comps"]
    planes = []
    zz = np.array(ZIGZAG)
    for ci, comp in enumerate(comps):
        c = coefs[ci]
        by, bx = c.shape[0], c.shape[1]
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[..., zz] = c
        nat *= qt[comp["tq"]].reshape(64)
        blocks = nat.reshape(by, bx, 8, 8)
        pix = np.einsum("ij,yxjk,kl->yxil", _DCT.T, blocks, _DCT) + 128.0
        planes.append(pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _finish_planes(
        planes, comps, frame["max_h"], frame["max_v"], frame["h"], frame["w"]
    )


def _finish_planes(planes, comps, max_h, max_v, h, w) -> np.ndarray:
    """Upsample subsampled planes, crop the MCU padding, color-convert."""
    out_planes = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if comp["h"] != max_h or comp["v"] != max_v:
            p = np.repeat(
                np.repeat(p, max_v // comp["v"], axis=0), max_h // comp["h"], axis=1
            )
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
