"""Streaming parity and multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import load_table
from feature_store_ml_spark.operators import features, multimodal
from feature_store_ml_spark.streaming import events as se


def test_stream_batch_parity(spark, sf_dir):
    """The streaming windowed agg must produce exactly the batch result."""
    streamed = se.stream_window_counts(spark, sf_dir, "1 hour").toPandas()
    ev = load_table(spark, sf_dir, "events")
    batch = (
        features.tumbling_features(ev, "1 hour")
        .select(
            "window_start",
            "event_type",
            "n_events",
            F.expr("cast(cast(cast(sum_value as decimal(30,8)) as string) as double)").alias("sum_value"),
        )
        .toPandas()
    )
    key = ["window_start", "event_type"]
    s = streamed.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s.n_events.values == b.n_events.values).all()
    assert (s.sum_value.values == b.sum_value.values).all()


def test_stream_dedup_within_watermark(spark, sf_dir):
    deduped = se.run_stream_to_table(
        spark, se.dedup_within_watermark(se._streaming_events(spark, sf_dir))
    )
    ev = load_table(spark, sf_dir, "events")
    assert deduped.count() == ev.select("event_id").distinct().count()


def test_multimodal_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 300)], "doc_id long, text string"
    )
    meta = multimodal.decode_image_meta(multimodal.attach_fake_image(df)).toPandas()
    m = meta.set_index("doc_id")
    assert m.loc[1, "n_bytes"] == 24 + len("hello world")
    assert m.loc[1, "format"] == "fakeimg"
    assert m.loc[1, "width"] == (len("hello world") * 7919 + 13) % 1920 + 1
    assert m.loc[2, "height"] == (300 * 104729 + 17) % 1080 + 1


def test_multimodal_unknown_format_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"JPEGJUNK----"))], "doc_id long, image binary")
    with pytest.raises(Exception) as ei:
        multimodal.decode_image_meta(df).collect()
    assert "NotImplementedError" in str(ei.value) or "real image decode" in str(ei.value)


def test_resize_respects_max_side(spark):
    df = spark.createDataFrame(
        [(1, "x" * 50), (2, "y" * 400)], "doc_id long, text string"
    )
    resized = multimodal.resize_image(multimodal.attach_fake_image(df), max_side=100)
    meta = multimodal.decode_image_meta(resized).toPandas().set_index("doc_id")
    assert (meta[["width", "height"]].max(axis=1) <= 100).all()
    # aspect ratio approximately preserved for the downscaled row
    orig_w = (400 * 7919 + 13) % 1920 + 1
    orig_h = (400 * 104729 + 17) % 1080 + 1
    got = meta.loc[2]
    assert abs(got.width / got.height - orig_w / orig_h) < 0.1


def test_sample_frames_shape(spark):
    df = spark.createDataFrame([(1, "hello world " * 20)], "doc_id long, text string")
    vids = multimodal.attach_fake_image(df).withColumnRenamed("image", "video")
    frames = multimodal.sample_frames(vids, n_frames=4, fps=2.0).toPandas()
    assert list(frames.frame_idx) == [0, 1, 2, 3]
    assert list(frames.ts_ms) == [0, 500, 1000, 1500]
    assert (frames.frame.map(len) > 0).all()


def test_audio_non_wav_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"OggS----"))], "doc_id long, audio binary")
    with pytest.raises(Exception) as ei:
        multimodal.audio_features(df).collect()
    assert "torchaudio" in str(ei.value) or "NotImplementedError" in str(ei.value)


def _make_wav(rate, pcm, n_channels=1, bits=16):
    """Hand-rolled reference WAV writer (independent of synth_wav)."""
    import struct

    data = pcm.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, rate,
            rate * n_channels * bits // 8, n_channels * bits // 8, bits,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_audio_features_known_sine(spark):
    """PCM16 sine with known amplitude: rms ~ A/sqrt(2), peak ~ A, zcr ~
    2*freq/rate, exact n_samples/duration."""
    import numpy as np

    rate, freq, amp, n = 8000, 440.0, 0.5, 8000
    t = np.arange(n) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * amp * 32767).astype("<i2")
    df = spark.createDataFrame(
        [(7, bytearray(_make_wav(rate, pcm)))], "doc_id long, audio binary"
    )
    out = multimodal.audio_features(df).toPandas().iloc[0]
    assert (out.sample_rate, out.n_channels, out.bits) == (8000, 1, 16)
    assert out.n_samples == n and out.duration_ms == 1000
    assert abs(out.rms - amp / np.sqrt(2)) < 0.01
    assert abs(out.peak - amp) < 0.01
    assert abs(out.zcr - 2 * freq / rate) < 0.005


def test_audio_features_stereo_mixdown(spark):
    """Stereo L=+x, R=-x mixes to ~silence; equal channels mix to the mono
    signal."""
    import numpy as np

    rate, n = 8000, 4000
    x = (np.sin(2 * np.pi * 200 * np.arange(n) / rate) * 0.4 * 32767).astype("<i2")
    opposite = np.empty(2 * n, dtype="<i2")
    opposite[0::2], opposite[1::2] = x, -x
    df = spark.createDataFrame(
        [(1, bytearray(_make_wav(rate, opposite, n_channels=2)))],
        "doc_id long, audio binary",
    )
    out = multimodal.audio_features(df).toPandas().iloc[0]
    assert out.n_channels == 2 and out.n_samples == n
    assert out.rms < 0.001  # opposite channels cancel


def test_synth_wav_roundtrip(spark):
    """synth_wav payloads decode back through audio_features with the
    advertised rate/duration."""
    df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    out = multimodal.audio_features(multimodal.synth_wav(df)).toPandas()
    assert len(out) == 5
    assert (out.sample_rate == 8000).all()
    assert (out.duration_ms == 250).all()
    assert (out.rms > 0.1).all()  # real non-silent samples


def test_stream_stream_join_batch_parity(spark, sf_dir):
    """The streaming interval join must produce exactly the rows the batch
    range join produces on the same bounded input."""
    from pyspark.sql import functions as F
    from feature_store_ml_spark.io.sources import load_table
    from feature_store_ml_spark.streaming import events as ev

    streamed = ev.stream_click_attribution(spark, sf_dir).toPandas()

    b = load_table(spark, sf_dir, "events")
    c = b.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("l_id"), F.col("user_id").alias("u"), F.col("ts").alias("l_ts")
    )
    v = b.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("r_id"), F.col("user_id").alias("u2"), F.col("ts").alias("r_ts")
    )
    batch = (
        c.join(
            v,
            (F.col("u") == F.col("u2"))
            & (F.col("r_ts") <= F.col("l_ts"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "l_id", "r_id", F.col("u").alias("user_id"),
            (F.unix_micros(F.col("l_ts").cast("timestamp")) -
             F.unix_micros(F.col("r_ts").cast("timestamp"))).alias("gap_us"),
        )
        .toPandas()
    )
    key = ["l_id", "r_id"]
    s = streamed.sort_values(key, ignore_index=True)
    t = batch.sort_values(key, ignore_index=True)
    assert s[["l_id", "r_id", "user_id", "gap_us"]].equals(
        t[["l_id", "r_id", "user_id", "gap_us"]]
    )


def test_ppm_image_features_known_image(spark):
    """Hand-built 2x2 P6 PPM (with a header comment) -> exact channel stats."""
    import numpy as np
    from feature_store_ml_spark.operators import multimodal as mm

    raster = bytes([255, 0, 0,  0, 255, 0,
                    0, 0, 255,  255, 255, 255])
    ppm = b"P6\n# a comment\n2 2\n255\n" + raster
    df = spark.createDataFrame([(1, ppm)], "doc_id long, image binary")
    r = mm.image_features(df).first()
    assert (r.width, r.height, r.maxval, r.n_pixels) == (2, 2, 255, 4)
    assert r.mean_r == 127.5 and r.mean_g == 127.5 and r.mean_b == 127.5
    luma = 0.299 * np.array([255, 0, 0, 255]) + 0.587 * np.array([0, 255, 0, 255]) \
        + 0.114 * np.array([0, 0, 255, 255])
    assert abs(r.luma_mean - luma.mean()) < 1e-6
    assert abs(r.luma_std - luma.std()) < 1e-6


def test_ppm_resize_real_raster(spark):
    from feature_store_ml_spark.operators import multimodal as mm

    d = spark.range(5).withColumnRenamed("id", "doc_id")
    big = mm.synth_ppm(d)
    small = mm.resize_ppm(big, max_side=4)
    rows = small.collect()
    for r in rows:
        assert max(r.width, r.height) <= 4
        # payload is a real PPM whose raster length matches the new dims
        w, h, maxval, px = mm._parse_ppm(bytes(r.image))
        assert (w, h) == (r.width, r.height)
        assert px.shape == (h, w, 3)
    # resized image still decodes through the feature extractor
    feats = mm.image_features(small).collect()
    assert len(feats) == 5


def test_ppm_non_ppm_raises(spark):
    import pytest as _pytest
    from feature_store_ml_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, b"\x89PNG....")], "doc_id long, image binary")
    with _pytest.raises(Exception, match="Pillow"):
        mm.image_features(df).collect()


def test_foreach_batch_idempotent_sink(spark, sf_dir, tmp_path):
    """foreachBatch epoch-dir sink: rows written == rows streamed, and
    re-running the same bounded query with a fresh checkpoint overwrites
    epoch dirs rather than duplicating rows."""
    from feature_store_ml_spark.streaming import events as ev

    out = str(tmp_path / "sink")
    s = ev._streaming_events(spark, sf_dir).select("event_id", "user_id", "value")
    ids1 = ev.run_stream_foreach_batch_idempotent(spark, s, out)
    assert ids1  # at least one micro-batch ran
    from feature_store_ml_spark.io import load_table
    n_expected = load_table(spark, sf_dir, "events").count()
    got = spark.read.parquet(f"{out}/epoch=*")
    assert got.count() == n_expected
    assert got.select("event_id").distinct().count() == n_expected

    # second run: same epoch ids -> same dirs overwritten, no duplication
    ids2 = ev.run_stream_foreach_batch_idempotent(spark, s, out)
    assert ids2 == ids1
    again = spark.read.parquet(f"{out}/epoch=*")
    assert again.count() == n_expected


def test_ppmv_video_end_to_end(spark):
    """Real video path: synth PPMV container -> demux every 2nd frame ->
    every frame decodes through the real PPM image parser."""
    from feature_store_ml_spark.operators import multimodal as mm

    d = spark.range(4).withColumnRenamed("id", "doc_id")
    vids = mm.synth_ppmv(d, n_frames=8, fps=4.0)
    frames = mm.sample_frames_ppmv(vids, every_k=2)
    rows = frames.collect()
    assert len(rows) == 4 * 4  # 8 frames, every 2nd
    assert sorted({r.frame_idx for r in rows}) == [0, 2, 4, 6]
    # timestamps derive from container fps (4 fps -> 250ms per frame)
    assert {r.ts_ms for r in rows if r.frame_idx == 2} == {500}
    # each sampled frame is a genuine P6 image: decode + stats
    feats = mm.image_features(
        frames.selectExpr("doc_id", "frame as image")
    ).collect()
    assert len(feats) == 16
    assert all(f.n_pixels == f.width * f.height for f in feats)
    # frames differ over time (moving gradient): mean_b varies with idx
    fr = {(r.doc_id, r.frame_idx): r.frame for r in rows}
    assert fr[(1, 0)] != fr[(1, 2)]


def test_ppmv_bad_magic_raises(spark):
    import pytest as _pytest
    from feature_store_ml_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, b"\x00\x00\x00\x18ftypmp42")], "doc_id long, video binary")
    with _pytest.raises(Exception, match="pyav"):
        mm.sample_frames_ppmv(df).collect()


# ------------------------------------------------- optional Pillow branch ----


def test_synth_png_is_wellformed_png(spark):
    """The stdlib PNG encoder must emit spec-valid chunks: magic, CRC-framed
    IHDR/IDAT/IEND, dims matching the synth gradient — checked by a pure
    chunk walk, no Pillow needed."""
    import struct
    import zlib

    row = (
        multimodal.synth_png(spark.createDataFrame([(3,)], "doc_id long"))
        .collect()[0]
    )
    payload = bytes(row.image)
    assert payload[:8] == multimodal._PNG_MAGIC
    pos, chunks = 8, []
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        assert crc == zlib.crc32(ctype + data) & 0xFFFFFFFF, f"bad CRC in {ctype}"
        chunks.append((ctype, data))
        pos += 12 + ln
    assert [c for c, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    w, h = struct.unpack(">II", chunks[0][1][:8])
    assert (w, h) == (8 + 3 * 7 % 25, 6 + 3 * 11 % 19)
    # IDAT inflates to h scanlines of 1 filter byte + 3w pixels
    assert len(zlib.decompress(chunks[1][1])) == h * (1 + 3 * w)


def test_png_decodes_natively_matches_ppm(spark):
    """Round 6: the stdlib PNG DECODER (_decode_png) closes the loop — the
    full encode→decode→features lifecycle runs with no Pillow, and must
    yield EXACTLY the stats of the uncompressed PPM of the same raster
    (PNG is lossless)."""
    ids = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    via_png = (
        multimodal.image_features(multimodal.synth_png(ids))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    via_ppm = (
        multimodal.image_features(multimodal.synth_ppm(ids))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert via_png.equals(via_ppm)


def test_png_unfilter_all_filter_types():
    """Hand-built PNGs exercising every scanline filter (Sub/Up/Average/
    Paeth) and the non-RGB color types (grayscale, RGBA, palette) — each
    must reconstruct the exact raster."""
    import struct
    import zlib

    import numpy as np

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png(w, h, color_type, channels, scanlines, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        body = multimodal._PNG_MAGIC + chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte)
        return body + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")

    rng = np.random.RandomState(7)
    raster = rng.randint(0, 256, (4, 5, 3), dtype=np.uint8)

    def filtered(raster, filters):
        h, w, ch = raster.shape
        flat = raster.reshape(h, w * ch).astype(np.int16)
        out = b""
        for y, f in enumerate(filters):
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(w * ch, np.int16)
            if f == 0:
                enc = cur
            elif f == 1:
                left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
                enc = cur - left
            elif f == 2:
                enc = cur - prev
            elif f == 3:
                left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
                enc = cur - (left + prev) // 2
            else:  # paeth
                enc = np.zeros_like(cur)
                for x in range(w * ch):
                    a = int(cur[x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    enc[x] = cur[x] - pred
            out += bytes([f]) + (enc % 256).astype(np.uint8).tobytes()
        return out

    # every filter type on an RGB raster
    payload = png(5, 4, 2, 3, filtered(raster, [1, 2, 3, 4]))
    w, h, maxval, got = multimodal._decode_png(payload)
    assert (w, h, maxval) == (5, 4, 255)
    assert np.array_equal(got, raster)

    # grayscale replicates into 3 channels
    gray = rng.randint(0, 256, (3, 4, 1), dtype=np.uint8)
    w, h, _, got = multimodal._decode_png(png(4, 3, 0, 1, filtered(gray, [0, 1, 2])))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))

    # RGBA drops alpha
    rgba = rng.randint(0, 256, (2, 3, 4), dtype=np.uint8)
    w, h, _, got = multimodal._decode_png(png(3, 2, 6, 4, filtered(rgba, [4, 3])))
    assert np.array_equal(got, rgba[:, :, :3])

    # palette resolves through PLTE
    plte = rng.randint(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, (2, 3, 1), dtype=np.uint8)
    w, h, _, got = multimodal._decode_png(
        png(3, 2, 3, 1, filtered(idx, [0, 1]), plte=plte.tobytes())
    )
    assert np.array_equal(got, plte[idx[:, :, 0]])


@pytest.mark.skipif(
    multimodal.pillow_available(), reason="Pillow installed: fail-loud leg n/a"
)
def test_jpeg_decodes_natively_without_pillow():
    # round 8: baseline JPEG decodes through operators/jpeg.py — a real
    # payload parses; truncated garbage still fails loudly (from the
    # native marker walk, not a Pillow-missing gate)
    import numpy as np

    from feature_store_ml_spark.operators import jpeg as _jpeg

    img = np.full((8, 8, 3), (10, 20, 30), dtype=np.uint8)
    w, h, maxval, arr = multimodal._parse_ppm(_jpeg.encode_jpeg(img))
    assert (w, h, maxval) == (8, 8, 255)
    assert np.max(np.abs(arr.astype(int) - img.astype(int))) <= 1
    with pytest.raises(ValueError, match="SOS|marker|truncated"):
        multimodal._parse_ppm(b"\xff\xd8\xff\xe0" + b"\x00" * 32)




def test_png_roundtrip_property():
    """Property: ANY uint8 RGB raster survives encode -> decode bit-exact
    (PNG is lossless; the stdlib writer emits filter-0 scanlines and the
    decoder reconstructs them through the shared unfilter path)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(w, h, seed):
        raster = np.random.RandomState(seed).randint(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        got_w, got_h, maxval, got = multimodal._decode_png(
            multimodal._png_bytes(raster)
        )
        assert (got_w, got_h, maxval) == (w, h, 255)
        assert np.array_equal(got, raster)

    roundtrip()
