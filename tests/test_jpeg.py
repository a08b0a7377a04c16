"""Native baseline JPEG codec (operators/jpeg.py) + the E14 lifecycle it
unlocks. The solid-color test is ANALYTIC (pins DC coding, quant, zigzag
origin, IDCT normalization and the color transform absolutely — a shared
encoder/decoder permutation bug cannot produce a near-identity there);
gradients and noise pin the AC path by PSNR; marker-profile refusals pin
the fail-loud boundary."""

import numpy as np
import pytest

from feature_store_ml_spark.operators import jpeg, multimodal


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_solid_color_analytic():
    for color in [(200, 30, 90), (0, 0, 0), (255, 255, 255), (17, 203, 64)]:
        img = np.full((16, 16, 3), color, dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 1, color


def test_gradient_roundtrip_all_modes():
    y, x = np.mgrid[0:64, 0:64]
    img = np.dstack([x * 4 % 256, y * 4 % 256, (x + y) * 2 % 256]).astype(np.uint8)
    for subsample in (False, True):
        for ri in (0, 3):
            enc = jpeg.encode_jpeg(img, quality=90, subsample=subsample,
                                   restart_interval=ri)
            dec = jpeg.decode_jpeg(enc)
            assert dec.shape == img.shape
            assert _psnr(dec, img) > 40, (subsample, ri)


def test_noise_roundtrip_444():
    img = np.random.default_rng(3).integers(0, 255, (37, 53, 3)).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 30


def test_odd_dimensions_and_small():
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 23)]:
        img = np.full((h, w, 3), (10, 200, 100), dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsample=True))
        assert dec.shape == (h, w, 3)
        assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 2


def test_quality_monotonic_size():
    y, x = np.mgrid[0:48, 0:48]
    img = np.dstack([x * 5 % 256, (x * y) % 256, y * 5 % 256]).astype(np.uint8)
    sizes = [len(jpeg.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]
    # lower quality still structurally decodable
    assert jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=30)).shape == img.shape


def test_mislabeled_progressive_fails_loudly():
    """A baseline stream with its SOF rewritten to SOF2 carries an
    illegal progressive scan header (Ss=0, Se=63) — the decoder must
    refuse it rather than decode garbage."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(jpeg.encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="scan header"):
        jpeg.decode_jpeg(bytes(enc))


def test_arithmetic_profiles_still_refuse():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(jpeg.encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    for sof in (0xCA, 0xC9, 0xC3):
        enc2 = bytearray(enc)
        enc2[i + 1] = sof
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(bytes(enc2))


def test_not_a_jpeg_fails():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\nnope")


def test_restart_markers_present_and_consumed():
    y, x = np.mgrid[0:32, 0:32]
    img = np.dstack([x * 8 % 256, y * 8 % 256, (x * y) % 256]).astype(np.uint8)
    enc = jpeg.encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    # the (x*y)%256 channel is deliberately high-frequency: ~34.6 dB at
    # q90 regardless of restart interval — assert the restart path is
    # LOSSLESS relative to ri=0, plus a sanity floor
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    got = jpeg.decode_jpeg(enc)
    assert np.array_equal(base, got), "restart path altered decoded pixels"
    assert _psnr(got, img) > 30


# ---------------------------------------------------- Spark lifecycle ----


def test_synth_jpeg_image_features_lifecycle(spark):
    """The E14 bar: JPEG decode runs IN THIS CONTAINER (no Pillow) through
    the same mapInPandas plumbing as PPM/PNG, and the decoded channel
    means land within the lossy bound of the analytic gradient means."""
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    imgs = multimodal.synth_jpeg(df)
    feats = multimodal.image_features(imgs).collect()
    assert len(feats) == 40
    for r in feats:
        w = 8 + (r.doc_id * 7) % 25
        h = 6 + (r.doc_id * 11) % 19
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert abs(r.mean_b - (r.doc_id % 256)) < 2.5
        exp_r = sum(xx * 255 // max(w - 1, 1) for xx in range(w)) / w
        exp_g = sum(yy * 255 // max(h - 1, 1) for yy in range(h)) / h
        assert abs(r.mean_r - exp_r) < 2.5
        assert abs(r.mean_g - exp_g) < 2.5


def test_jpeg_checksums_within_lossy_band(spark):
    df = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    rows = multimodal.image_checksums(multimodal.synth_jpeg(df)).collect()
    assert len(rows) == 25
    for r in rows:
        n = r.n_pixels
        assert abs(r.sum_b / n - (r.doc_id % 256)) < 2.5


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        subsample=st.booleans(),
    )
    def test_jpeg_roundtrip_property(w, h, seed, subsample):
        """ANY small uint8 RGB raster encodes to a parseable baseline
        JPEG that decodes back at the right dimensions with bounded
        worst-pixel error at q95 (JPEG is lossy; 8x8 DCT quantization at
        Annex-K/q95 stays within ~±32 even on noise)."""
        img = np.random.RandomState(seed).randint(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        dec = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=95, subsample=subsample)
        )
        assert dec.shape == img.shape
        if not subsample:  # chroma halving on noise is unbounded by design
            assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 64

except ImportError:
    pass


# ------------------------------------------------ progressive (round 9) ----
#
# The parity oracle is exact: encode_jpeg_progressive codes the SAME
# quantized coefficients as encode_jpeg, only spread across 10 scans
# (spectral selection + successive approximation) — so progressive
# decode must be BIT-IDENTICAL to the baseline decode of the same image.
# Hand-crafted streams then cover what our encoder never emits: EOB
# block-runs > 1 (they need non-Annex-K Huffman symbols) and restart
# intervals inside progressive scans.


def test_progressive_parity_with_baseline():
    rng = np.random.default_rng(11)
    cases = [
        (np.full((24, 24, 3), (200, 40, 90), np.uint8), False, 90),
        (rng.integers(0, 256, (33, 41, 3), dtype=np.uint8), False, 90),
        (rng.integers(0, 256, (17, 23, 3), dtype=np.uint8), True, 85),
        (rng.integers(0, 256, (29, 31, 3), dtype=np.uint8), False, 30),
        (rng.integers(0, 256, (16, 24, 3), dtype=np.uint8), True, 98),
    ]
    for img, subsample, q in cases:
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=q, subsample=subsample)
        )
        base = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=q, subsample=subsample)
        )
        assert prog.shape == img.shape
        assert np.array_equal(prog, base), (img.shape, subsample, q)


def test_progressive_solid_color_analytic():
    for color in [(200, 30, 90), (0, 0, 0), (255, 255, 255)]:
        img = np.full((16, 16, 3), color, dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=90))
        assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 1, color


def test_progressive_stress_many_shapes():
    rng = np.random.default_rng(5)
    for _ in range(12):
        h = int(rng.integers(8, 64))
        w = int(rng.integers(8, 64))
        q = int(rng.integers(25, 99))
        sub = bool(rng.integers(0, 2))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=q, subsample=sub)
        )
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, subsample=sub))
        assert np.array_equal(prog, base), (h, w, q, sub)


def _seg(marker, payload):
    import struct

    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _gray_prog_header(w, dri=None):
    """SOI + DQT(flat 16) + SOF2 (8×w grayscale) + Annex-K DC table."""
    import struct

    q = bytes([16] * 64)
    out = b"\xff\xd8" + _seg(0xDB, bytes([0]) + q)
    out += _seg(0xC2, struct.pack(">BHHB", 8, 8, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(jpeg._DC_LUMA_BITS) + bytes(jpeg._DC_LUMA_VALS),
    )
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    return out


def test_progressive_eob_run_spanning_blocks():
    """EOB run categories > 0 (symbols 0x10/0x20/... with extra bits) —
    our encoder never emits them (Annex K tables lack the symbols), so a
    custom AC table + hand-written entropy stream covers the decoder's
    multi-block EOBRUN path: ONE EOB4 symbol ends the AC band of all
    four blocks."""
    # custom AC table: two 2-bit symbols — 0x20 (EOB, category 2) and
    # 0x01 (run 0, size 1), canonical order
    ac_bits = [0, 2] + [0] * 14
    ac_vals = [0x20, 0x01]
    stream = _gray_prog_header(32)
    stream += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    # scan 1: DC first, Al=0 — blocks at quantized DC 0, 8, 16, 24
    bw = jpeg._BitWriter()
    dc = jpeg._canonical_codes(jpeg._DC_LUMA_BITS, jpeg._DC_LUMA_VALS)
    for diff in (0, 8, 8, 8):
        s, bits = jpeg._magnitude(diff)
        c, ln = dc[s]
        bw.put(c, ln)
        if s:
            bw.put(bits, s)
    bw.pad_to_byte()
    stream += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + bytes(bw.out)
    # scan 2: AC 1..63 first pass — one EOB4 (code for 0x20 = canonical
    # '00', then category-2 extra bits '00' → eobrun covers 4 blocks)
    bw = jpeg._BitWriter()
    ac = jpeg._canonical_codes(ac_bits, ac_vals)
    c, ln = ac[0x20]
    bw.put(c, ln)
    bw.put(0, 2)
    bw.pad_to_byte()
    stream += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bytes(bw.out)
    stream += b"\xff\xd9"
    dec = jpeg.decode_jpeg(stream)
    assert dec.shape == (8, 32, 3)
    # DC c → dequantized 16c → IDCT constant 2c → pixel 128 + 2c
    for b, c0 in enumerate((0, 8, 16, 24)):
        blk = dec[:, b * 8 : b * 8 + 8, 0]
        assert np.all(blk == 128 + 2 * c0), (b, np.unique(blk))


def test_progressive_restart_interval():
    """RSTn markers inside a progressive DC scan: predictor resets at
    each restart, byte alignment recovers."""
    stream = _gray_prog_header(32, dri=2)
    dc = jpeg._canonical_codes(jpeg._DC_LUMA_BITS, jpeg._DC_LUMA_VALS)
    entropy = b""
    bw = jpeg._BitWriter()
    for diff in (8, 0):  # blocks 1-2: dc 8, 8
        s, bits = jpeg._magnitude(diff)
        c, ln = dc[s]
        bw.put(c, ln)
        if s:
            bw.put(bits, s)
    bw.pad_to_byte()
    entropy += bytes(bw.out) + b"\xff\xd0"  # RST0
    bw = jpeg._BitWriter()
    for diff in (8, 0):  # predictor RESET: dc 8, 8 again
        s, bits = jpeg._magnitude(diff)
        c, ln = dc[s]
        bw.put(c, ln)
        if s:
            bw.put(bits, s)
    bw.pad_to_byte()
    entropy += bytes(bw.out)
    stream += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + entropy
    stream += b"\xff\xd9"
    dec = jpeg.decode_jpeg(stream)
    assert dec.shape == (8, 32, 3)
    assert np.all(dec[:, :, 0] == 144)  # every block dc=8 → 128 + 16
