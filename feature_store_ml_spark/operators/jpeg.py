"""Baseline-sequential + progressive JPEG codec, pure python + numpy —
no libjpeg.

JPEG is the dominant image format in any web-scale multimodal corpus, and
the one E14 modality that was env-gated on Pillow. This module implements
the BASELINE SEQUENTIAL and PROGRESSIVE (SOF2, round 9) profiles of the
public ITU-T T.81 spec directly:

- decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS marker walk, canonical
  Huffman table construction (BITS/HUFFVAL, Annex C), entropy-coded MCU
  stream with 0xFF00 byte-unstuffing and RSTn restart handling, DC
  differential + AC run-length (ZRL/EOB) coefficient decode (F.2.2),
  dequantize → un-zigzag → 8×8 inverse DCT (orthonormal matrix form) →
  chroma upsample (nearest) → YCbCr→RGB (JFIF/BT.601 full-range).
  Progressive decode (Annex G): coefficients accumulate across scans —
  spectral selection + successive approximation, EOB block-runs, DC/AC
  first and refinement passes, restart intervals — then one vectorized
  dequantize/IDCT reconstruction. Arithmetic (SOF9+), 12-bit and
  hierarchical profiles fail loudly by marker; baseline + progressive
  cover effectively all web JPEGs.
- encoder: the exact inverse with the Annex K example quantization and
  Huffman tables (the de-facto standard every camera/libjpeg Q-scaled
  variant derives from), libjpeg's quality→scale convention, optional
  4:2:0 subsampling (2×2 mean) and restart intervals. Exists so the
  Spark lifecycle (synth → decode → features) runs deterministically in
  containers with no imaging stack at all.

Grounding without a reference binary in this container: the solid-color
test is ANALYTIC (a constant block has one DC coefficient whose
quantized roundtrip error bound is computable — decode must return the
color within ±1), which pins DC coding, quant tables, zigzag[0], IDCT
normalization and the color transform absolutely; gradients/noise then
pin the AC path by PSNR; a shared-permutation encoder/decoder bug cannot
pass both.

Throughput honesty: the entropy loop is python-per-bit — fine for the
feature/metadata path over thumbnails and test corpora, ~100× off
libjpeg for bulk decode. The Spark-side contract (Arrow-batched
mapInPandas, binary in/out) is identical either way; installs of Pillow
take over automatically via multimodal.pillow_available().
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables ----

#: zigzag order: ZZ[k] = (row, col) of the k-th coefficient (T.81 fig 5)
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZCOLS = np.array([rc[1] for rc in _ZIGZAG])

#: Annex K.1/K.2 example quantization tables (luminance, chrominance)
_Q_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32
).reshape(8, 8)
_Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32
).reshape(8, 8)

#: Annex K.3 typical Huffman tables as (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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
]

#: orthonormal 8-point DCT-II matrix: dct2(B)=T@B@T.T, idct2(D)=T.T@D@T
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _c = np.sqrt(0.125) if _i == 0 else 0.5
        _T[_i, _j] = _c * np.cos((2 * _j + 1) * _i * np.pi / 16.0)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality convention: 1..100 → table scale factor."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------- huffman ----


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), canonical order (T.81 Annex C)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, for the bit-at-a-time decode loop."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill


class _BitReader:
    """Entropy-segment bit reader: unstuffs FF00, stops at any marker;
    RSTn markers are consumed by ``restart`` (byte-aligned, T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume the RSTn marker and re-align."""
        self.acc = 0
        self.n = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartPending(Exception):
    pass


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """Magnitude category decode (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category s, s-bit code) — encoder-side inverse of EXTEND."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


# -------------------------------------------------------------- encoder ----


def encode_jpeg(
    rgb: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an ``[h, w, 3] uint8`` array as baseline JFIF. ``subsample``
    writes 4:2:0 (2×2-mean chroma, MCU = 16×16), else 4:4:4."""
    h, w = rgb.shape[:2]
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
    qy, qc = _scaled_q(_Q_LUMA, quality), _scaled_q(_Q_CHROMA, quality)

    def _pad(ch: np.ndarray, mult: int) -> np.ndarray:
        ph = (-ch.shape[0]) % mult
        pw = (-ch.shape[1]) % mult
        return np.pad(ch, ((0, ph), (0, pw)), mode="edge")

    if subsample:
        ypl = _pad(y, 16)
        cbp = _pad(cb, 16)
        crp = _pad(cr, 16)
        # 2×2 mean downsample
        cb_s = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        cr_s = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        planes = [(ypl, qy, 2, 2), (cb_s, qc, 1, 1), (cr_s, qc, 1, 1)]
        mcu_y, mcu_x = 16, 16
    else:
        planes = [(_pad(y, 8), qy, 1, 1), (_pad(cb, 8), qc, 1, 1),
                  (_pad(cr, 8), qc, 1, 1)]
        mcu_y, mcu_x = 8, 8
    mcus_x = (w + mcu_x - 1) // mcu_x
    mcus_y = (h + mcu_y - 1) // mcu_y

    dc_tabs = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
               _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_tabs = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
               _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    bw = _BitWriter()
    pred = [0, 0, 0]

    def _block(plane, by, bx, q, tid, comp):
        blk = plane[by : by + 8, bx : bx + 8] - 128.0
        coef = _T @ blk @ _T.T
        # orthonormal 2D DCT differs from JPEG's by a factor of 1 (both
        # normalize so DC = 8 * mean for the T.81 convention): T.81's
        # S(0,0) = 1/4 * C*C * sum = 2 * mean_sum/16... the matrix form
        # here IS the T.81 definition (verified analytically in tests)
        qcoef = np.round(coef / q).astype(np.int64)
        zz = qcoef[_ZROWS, _ZCOLS]
        diff = int(zz[0]) - pred[comp]
        pred[comp] = int(zz[0])
        s, bitsv = _magnitude(diff)
        c, ln = dc_tabs[tid][s]
        bw.put(c, ln)
        if s:
            bw.put(bitsv, s)
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_tabs[tid][0xF0]  # ZRL
                bw.put(c, ln)
                run -= 16
            s, bitsv = _magnitude(v)
            c, ln = ac_tabs[tid][(run << 4) | s]
            bw.put(c, ln)
            bw.put(bitsv, s)
            run = 0
        if last < 63:
            c, ln = ac_tabs[tid][0x00]  # EOB
            bw.put(c, ln)

    segments: list[bytes] = []
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                segments.append(bytes(bw.out))
                segments.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                bw.out = bytearray()
                rst += 1
                pred[:] = [0, 0, 0]
            for ci, (plane, q, hs, vs) in enumerate(planes):
                tid = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        if subsample and ci == 0:
                            _block(plane, my * 16 + by * 8, mx * 16 + bx * 8,
                                   q, tid, ci)
                        else:
                            _block(plane, (my * (mcu_y // (2 if subsample else 1))
                                           if subsample else my * 8) + by * 8,
                                   (mx * (mcu_x // (2 if subsample else 1))
                                    if subsample else mx * 8) + bx * 8,
                                   q, tid, ci)
            mcu_count += 1
    bw.pad_to_byte()
    segments.append(bytes(bw.out))
    entropy = b"".join(segments)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(q[r, c]) for r, c in _ZIGZAG))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    hv_y = 0x22 if subsample else 0x11
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, hv_y, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (b"\xff\xd8" + app0 + dqt(0, qy) + dqt(1, qc)
            + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
            + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
            + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
            + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
            + sof + dri + sos + entropy + b"\xff\xd9")


def _plane_zz_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a padded plane → quantized ZIGZAG coefficients,
    shape (blocks_y, blocks_x, 64). The DCT runs per block with the EXACT
    expression the baseline encoder uses (``_T @ blk @ _T.T``) — a
    batched einsum/matmul contracts with different float rounding, and a
    coefficient landing exactly on a .5 quantization boundary then
    rounds differently, breaking the progressive-equals-baseline
    bit-parity contract."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane - 128.0).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.empty((bh, bw, 8, 8), dtype=np.float64)
    for i in range(bh):
        for j in range(bw):
            coef[i, j] = _T @ blocks[i, j] @ _T.T
    qz = np.round(coef / q[None, None, :, :]).astype(np.int64)
    return qz[:, :, _ZROWS, _ZCOLS]


def encode_jpeg_progressive(
    rgb: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode an ``[h, w, 3] uint8`` array as PROGRESSIVE JFIF (SOF2) —
    the classic libjpeg-style scan script: interleaved DC first pass at
    Al=1 plus a DC refinement, luma AC split into a low band and the
    tail across two successive-approximation levels, chroma AC at Al=1
    with refinements. Fixed Annex K tables; EOB runs are never
    accumulated across blocks (every emitted symbol — EOB0, ZRL and all
    run/size pairs — exists in the fixed tables, which is what makes
    custom per-scan Huffman optimization unnecessary)."""
    h, w = rgb.shape[:2]
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
    qy, qc = _scaled_q(_Q_LUMA, quality), _scaled_q(_Q_CHROMA, quality)

    def _pad(ch: np.ndarray, mult: int) -> np.ndarray:
        ph = (-ch.shape[0]) % mult
        pw = (-ch.shape[1]) % mult
        return np.pad(ch, ((0, ph), (0, pw)), mode="edge")

    if subsample:
        ypl = _pad(y, 16)
        cbp = _pad(cb, 16)
        crp = _pad(cr, 16)
        cb_s = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        cr_s = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        geom = [(ypl, qy, 2, 2), (cb_s, qc, 1, 1), (cr_s, qc, 1, 1)]
    else:
        geom = [(_pad(y, 8), qy, 1, 1), (_pad(cb, 8), qc, 1, 1),
                (_pad(cr, 8), qc, 1, 1)]
    hmax = max(g[2] for g in geom)
    vmax = max(g[3] for g in geom)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for ci, (plane, q, hs, vs) in enumerate(geom):
        comps.append(
            {
                "id": ci + 1,
                "h": hs,
                "v": vs,
                "tid": 0 if ci == 0 else 1,
                "zz": _plane_zz_coefs(plane, q),
                # non-interleaved AC scans cover the CEIL grid only —
                # MCU-padding blocks stay DC-only (spec A.2.2)
                "bw": (-(-w * hs // hmax) + 7) // 8,
                "bh": (-(-h * vs // vmax) + 7) // 8,
            }
        )
    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def _scan_bytes(scan_comps, ss, se, ah, al) -> bytes:
        bw_ = _BitWriter()
        if ss == 0:
            pred = {c["id"]: 0 for c in scan_comps}
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for c in scan_comps:
                        dct = dc_codes[c["tid"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc = int(
                                    c["zz"][my * c["v"] + by, mx * c["h"] + bx, 0]
                                )
                                if ah == 0:
                                    v = dc >> al  # arithmetic shift (G.1.2.1)
                                    diff = v - pred[c["id"]]
                                    pred[c["id"]] = v
                                    s, bits = _magnitude(diff)
                                    code, ln = dct[s]
                                    bw_.put(code, ln)
                                    if s:
                                        bw_.put(bits, s)
                                else:
                                    bw_.put((dc >> al) & 1, 1)
        else:
            (c,) = scan_comps
            act = ac_codes[c["tid"]]
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    band = [int(v) for v in c["zz"][by, bx, ss : se + 1]]
                    # AC point transform: magnitude shift toward zero
                    pt = [
                        (1 if v > 0 else -1) * (abs(v) >> al) if v else 0
                        for v in band
                    ]
                    if ah == 0:
                        run = 0
                        for v in pt:
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act[0xF0]
                                bw_.put(code, ln)
                                run -= 16
                            s, bits = _magnitude(v)
                            code, ln = act[(run << 4) | s]
                            bw_.put(code, ln)
                            bw_.put(bits, s)
                            run = 0
                        if run > 0:
                            code, ln = act[0x00]
                            bw_.put(code, ln)
                    else:
                        # refinement: correction bits buffer and flush
                        # after the next emitted symbol, matching the
                        # decoder's positional sweep (G.1.2.3). The ZRL
                        # check runs at EVERY nonzero position — emitting
                        # it only at newly-significant ones would flush
                        # correction bits for history positions the
                        # decoder hasn't walked yet — and zero-runs past
                        # the last newly-significant coefficient fold
                        # into the EOB.
                        buf: list[int] = []

                        def _flush():
                            for b in buf:
                                bw_.put(b, 1)
                            buf.clear()

                        eob_i = max(
                            (i for i, v in enumerate(pt) if abs(v) == 1),
                            default=-1,
                        )
                        run = 0
                        for i, v in enumerate(pt):
                            a = abs(v)
                            if a == 0:
                                run += 1
                                continue
                            while run > 15 and i <= eob_i:
                                code, ln = act[0xF0]
                                bw_.put(code, ln)
                                _flush()
                                run -= 16
                            if a > 1:
                                buf.append(a & 1)
                                continue
                            code, ln = act[(run << 4) | 1]
                            bw_.put(code, ln)
                            bw_.put(1 if v > 0 else 0, 1)
                            _flush()
                            run = 0
                        if run > 0 or buf:
                            code, ln = act[0x00]
                            bw_.put(code, ln)
                            _flush()
        bw_.pad_to_byte()
        if ss == 0:
            # DC scans: refinement needs no table, first pass the DC one
            tabs = bytes(
                v
                for c in scan_comps
                for v in (c["id"], (c["tid"] << 4) if ah == 0 else 0)
            )
        else:
            tabs = bytes(
                v for c in scan_comps for v in (c["id"], c["tid"])
            )
        sos = seg(
            0xDA,
            bytes([len(scan_comps)]) + tabs + bytes([ss, se, (ah << 4) | al]),
        )
        return sos + bytes(bw_.out)

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(q[r, c]) for r, c in _ZIGZAG))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    hv_y = 0x22 if subsample else 0x11
    sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, hv_y, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    yc, cbc, crc = comps
    script = [
        ([yc, cbc, crc], 0, 0, 0, 1),  # DC first, one bit held back
        ([yc], 1, 5, 0, 2),            # luma low band, coarse
        ([crc], 1, 63, 0, 1),
        ([cbc], 1, 63, 0, 1),
        ([yc], 6, 63, 0, 2),           # luma tail, coarse
        ([yc], 1, 63, 2, 1),           # luma refine 2→1
        ([yc, cbc, crc], 0, 0, 1, 0),  # DC refine
        ([crc], 1, 63, 1, 0),
        ([cbc], 1, 63, 1, 0),
        ([yc], 1, 63, 1, 0),           # luma refine 1→0
    ]
    body = b"".join(_scan_bytes(*s) for s in script)
    return (b"\xff\xd8" + app0 + dqt(0, qy) + dqt(1, qc)
            + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
            + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
            + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
            + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
            + sof + body + b"\xff\xd9")


# -------------------------------------------------------------- decoder ----


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline-sequential OR progressive (SOF2, spectral
    selection + successive approximation, T.81 Annex G) JFIF/EXIF bytes
    → ``[h, w, 3] uint8`` RGB. Grayscale decodes with the luma plane
    replicated. Fail-loud on arithmetic/12-bit/hierarchical profiles."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    coefs: dict[int, np.ndarray] | None = None
    frame: dict = {}
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT — may hold several tables
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0x0F
                o += 1
                if prec:
                    vals = struct.unpack_from(f">{64}H", body, o)
                    o += 128
                else:
                    vals = np.frombuffer(body[o : o + 64], dtype=np.uint8)
                    o += 64
                q = np.zeros((8, 8), dtype=np.int32)
                q[_ZROWS, _ZCOLS] = np.array(vals, dtype=np.int32)
                qtabs[tid] = q
        elif marker == 0xC4:  # DHT — may hold several tables
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_table(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported (8-bit only)")
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                frame = {
                    "mcus_x": mcus_x, "mcus_y": mcus_y,
                    "hmax": hmax, "vmax": vmax,
                }
                coefs = {}
                for c in comps:
                    # MCU-aligned coefficient grid; non-interleaved scans
                    # walk only the ceil grid (spec A.2.2) — padding
                    # blocks are DC-only
                    c["bw"] = (-(-w * c["h"] // hmax) + 7) // 8
                    c["bh"] = (-(-h * c["v"] // vmax) + 7) // 8
                    coefs[c["id"]] = np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                    )
        elif marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "differential/arithmetic progressive JPEG (SOF6/10/14) unsupported"
            )
        elif marker in (0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError(
                "lossless/arithmetic/hierarchical JPEG profile unsupported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append({**comp, "td": tabs >> 4, "ta": tabs & 0x0F})
            if not progressive:
                pos += ln
                return _decode_scan(
                    data, pos, scan, qtabs, dc_tabs, ac_tabs, h, w,
                    restart_interval,
                )
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos + ln, scan, ss, se, a >> 4, a & 0x0F,
                dc_tabs, ac_tabs, coefs, frame, restart_interval,
            )
            continue
        pos += ln
    if progressive and coefs is not None:
        return _reconstruct_progressive(coefs, comps, qtabs, h, w, frame)
    raise ValueError("no SOS marker — truncated or non-image JPEG")


def _decode_scan(data, pos, scan, qtabs, dc_tabs, ac_tabs, h, w, ri):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in scan
    ]
    pred = [0] * len(scan)
    r = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu and mcu % ri == 0:
                r.restart()
                pred[:] = [0] * len(scan)
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            blk = _decode_block(
                                r, dc_tabs[c["td"]], ac_tabs[c["ta"]],
                                qtabs[c["tq"]], pred, ci,
                            )
                        except _RestartPending:
                            # encoder emitted RST early (defensive)
                            r.restart()
                            pred[:] = [0] * len(scan)
                            blk = _decode_block(
                                r, dc_tabs[c["td"]], ac_tabs[c["ta"]],
                                qtabs[c["tq"]], pred, ci,
                            )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu += 1
    # upsample each component to full MCU-grid resolution (nearest)
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        yp = np.clip(full[0] + 128.0, 0, 255)
        return np.dstack([yp, yp, yp]).astype(np.uint8)
    yp, cbp, crp = full[0] + 128.0, full[1], full[2]
    rch = yp + 1.402 * crp
    gch = yp - 0.344136 * cbp - 0.714136 * crp
    bch = yp + 1.772 * cbp
    return np.clip(np.dstack([rch, gch, bch]), 0, 255).astype(np.uint8)


def _decode_block(r, dct, act, q, pred, ci):
    s = _huff_decode(r, dct)
    diff = _extend(r.receive(s), s)
    pred[ci] += diff
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(r, act)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    coef[_ZROWS, _ZCOLS] = zz * q[_ZROWS, _ZCOLS]
    return _T.T @ coef @ _T


# -------------------------------------------------- progressive decode ----
# T.81 Annex G: coefficients accumulate across scans — spectral selection
# (each AC scan covers one band Ss..Se of ONE component) and successive
# approximation (Ah=0 first pass sends values >> Al; refinement passes
# add one bit of precision each). DC scans may interleave components;
# non-interleaved scans walk the component's own ceil block grid.


def _decode_prog_scan(
    data, pos, scan, ss, se, ah, al, dc_tabs, ac_tabs, coefs, frame, ri
):
    """Decode one progressive scan's entropy data into the coefficient
    store; returns the byte offset of the next marker."""
    if ss > se or se > 63 or (ss == 0) != (se == 0) or ah not in range(14) \
            or (ah and ah != al + 1):
        raise ValueError(
            f"invalid progressive scan header (Ss={ss} Se={se} Ah={ah} "
            f"Al={al}) — a baseline stream mislabeled SOF2?"
        )
    r = _BitReader(data, pos)
    eobrun = [0]
    pred = {c["id"]: 0 for c in scan}

    def _reset():
        for k in pred:
            pred[k] = 0
        eobrun[0] = 0

    def _unit(c, by, bx):
        blk = coefs[c["id"]][by, bx]
        if ss == 0:
            if ah == 0:
                s = _huff_decode(r, dc_tabs[c["td"]])
                pred[c["id"]] += _extend(r.receive(s), s)
                blk[0] = pred[c["id"]] * (1 << al)
            elif r.bit():
                blk[0] |= 1 << al
        elif ah == 0:
            _prog_ac_first(r, ac_tabs[c["ta"]], blk, ss, se, al, eobrun)
        else:
            _prog_ac_refine(r, ac_tabs[c["ta"]], blk, ss, se, al, eobrun)

    def _guarded(c, by, bx):
        try:
            _unit(c, by, bx)
        except _RestartPending:
            r.restart()
            _reset()
            _unit(c, by, bx)

    if len(scan) > 1:
        if ss != 0:
            raise ValueError("interleaved AC scan is illegal in progressive")
        n = 0
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                if ri and n and n % ri == 0:
                    r.restart()
                    _reset()
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _guarded(c, my * c["v"] + by, mx * c["h"] + bx)
                n += 1
    else:
        c = scan[0]
        n = 0
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                if ri and n and n % ri == 0:
                    r.restart()
                    _reset()
                _guarded(c, by, bx)
                n += 1
    # resync: scan forward to the next real marker (skip stuffed bytes,
    # RSTn, and 0xFF fill)
    p = r.pos
    while p + 1 < len(data):
        if data[p] != 0xFF:
            p += 1
            continue
        nxt = data[p + 1]
        if nxt == 0x00 or nxt == 0xFF or 0xD0 <= nxt <= 0xD7:
            p += 1 if nxt == 0xFF else 2
            continue
        break
    return p


def _prog_ac_first(r, act, blk, ss, se, al, eobrun):
    """First AC pass of a band (Ah=0): values arrive scaled down by the
    point transform (<< Al on decode); EOB symbols carry a BLOCK-run."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(r, act)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run < 15:
                eobrun[0] = (1 << run) - 1
                if run:
                    eobrun[0] += r.receive(run)
                return
            k += 16  # ZRL
        else:
            k += run
            if k > se:
                raise ValueError("AC run past spectral band")
            blk[k] = _extend(r.receive(size), size) * (1 << al)
            k += 1


def _prog_ac_refine(r, act, blk, ss, se, al, eobrun):
    """Refinement AC pass (Ah=Al+1): one correction bit per already-
    nonzero coefficient, ±1<<Al insertions for newly-significant ones,
    EOB block-runs still consuming correction bits across the band."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun[0] > 0:
        eobrun[0] -= 1
        while k <= se:
            c = int(blk[k])
            if c != 0 and r.bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c > 0 else m1)
            k += 1
        return
    while k <= se:
        rs = _huff_decode(r, act)
        run, size = rs >> 4, rs & 0x0F
        val = 0
        if size == 0:
            if run < 15:
                eobrun[0] = (1 << run) - 1
                if run:
                    eobrun[0] += r.receive(run)
                run = 64  # sweep the rest of the band, corrections only
        else:
            if size != 1:
                raise ValueError("bad successive-approximation AC symbol")
            val = p1 if r.bit() else m1
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if r.bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c > 0 else m1)
            else:
                if run == 0:
                    if val:
                        blk[k] = val
                    k += 1
                    break
                run -= 1
            k += 1


def _reconstruct_progressive(coefs, comps, qtabs, h, w, frame):
    """Dequantize + IDCT the accumulated coefficient store and assemble
    RGB — one vectorized einsum per component, no per-block loop."""
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for c in comps:
        arr = coefs[c["id"]].astype(np.float64)  # (by, bx, 64) zigzag
        q = qtabs[c["tq"]]
        by, bx = arr.shape[:2]
        mat = np.zeros((by, bx, 8, 8), dtype=np.float64)
        mat[:, :, _ZROWS, _ZCOLS] = arr
        mat *= q[None, None, :, :]
        # IDCT per block with the EXACT expression _decode_block uses —
        # batched matmul/einsum contract with different float rounding,
        # and a value landing exactly on a .5 boundary then decodes ±1
        # off the baseline decode of the same coefficients, breaking the
        # bit-parity contract the progressive path advertises
        blocks = np.empty((by, bx, 8, 8), dtype=np.float64)
        for i in range(by):
            for j in range(bx):
                blocks[i, j] = _T.T @ mat[i, j] @ _T
        plane = blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:h, :w])
    if len(full) == 1:
        yp = np.clip(full[0] + 128.0, 0, 255)
        return np.dstack([yp, yp, yp]).astype(np.uint8)
    yp, cbp, crp = full[0] + 128.0, full[1], full[2]
    rch = yp + 1.402 * crp
    gch = yp - 0.344136 * cbp - 0.714136 * crp
    bch = yp + 1.772 * cbp
    return np.clip(np.dstack([rch, gch, bch]), 0, 255).astype(np.uint8)
