"""Custom stateful streaming op (EWMA) and the vectorized pandas k-NN twin."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import load_table
from feature_store_ml_spark.operators import similarity
from feature_store_ml_spark.streaming import events as se


def test_stream_ewma_matches_batch_recurrence(spark, sf_dir):
    alpha = 0.3
    out = se.stream_ewma(spark, sf_dir, alpha=alpha).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()

    # batch replica of the recurrence, per user in ts order
    ev = ev.sort_values(["ts", "event_id"])
    expected = {}
    state = {}
    for r in ev.itertuples():
        prev = state.get(r.user_id)
        e = r.value if prev is None else alpha * r.value + (1 - alpha) * prev
        state[r.user_id] = e
        expected[r.event_id] = e

    got = dict(zip(out.event_id, out.ewma))
    assert len(got) == len(expected)
    mismatches = [k for k in expected if abs(got[k] - expected[k]) > 1e-9]
    assert not mismatches, f"{len(mismatches)} mismatching events"
    # n_seen is a proper per-user counter
    max_seen = out.groupby("user_id").n_seen.max()
    counts = out.groupby("user_id").size()
    assert (max_seen == counts).all()


def test_pandas_knn_guard_rejects_large_query_side(spark, sf_dir):
    """The driver-collect of the query side must fail loudly past
    max_queries, not OOM the driver."""
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        similarity.cosine_topk_pandas(emb, emb, k=5, max_queries=10).toPandas()


def test_pandas_knn_matches_expression_knn(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    a = similarity.cosine_topk(emb, queries, k=5).toPandas()
    b = similarity.cosine_topk_pandas(emb, queries, k=5).toPandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a.neighbor_id.values == b.neighbor_id.values).all()
    assert (abs(a.cos_sim.values - b.cos_sim.values) < 2e-6).all()
