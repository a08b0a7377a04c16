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


def test_audio_stub_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"RIFF----"))], "doc_id long, audio binary")
    with pytest.raises(Exception) as ei:
        multimodal.audio_features(df).collect()
    assert "torchaudio" in str(ei.value) or "NotImplementedError" in str(ei.value)
