"""EMBEDDING FEATURE GROUP on the Iceberg backend (round 13, rides the
nested-type support): the driver's own array<float> embedding column
lives under lakehouse DML — materialize, serve via point-in-time join,
GDPR-retract, and prove retracted vectors NEVER surface in ANN results
computed off the lakehouse read."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.feature_store import FeatureGroup, FeatureStore
from feature_store_ml_spark.io import iceberg
from feature_store_ml_spark.operators import similarity


def _store(tmp_path, fmt="iceberg"):
    fs = FeatureStore(root=str(tmp_path / "fs"), table_format=fmt)
    fs.register(
        FeatureGroup(
            name="emb",
            keys=("vec_id",),
            ts_col="ts",
            build=lambda src: src.select(
                "vec_id",
                "embedding",
                "label",
                F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
            ),
        )
    )
    return fs


@pytest.mark.parametrize("fmt", ["iceberg", "delta"])
def test_embedding_group_roundtrips_on_both_backends(
    spark, sf_dir, tmp_path, fmt
):
    fs = _store(tmp_path, fmt)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fs.materialize(spark, e, "emb", run_version=1)
    back = fs.read(spark, "emb")
    assert back.count() == e.count()
    # the vectors survive the lakehouse roundtrip bit-exact
    a = {r.vec_id: r.embedding for r in back.collect()}
    b = {r.vec_id: r.embedding for r in e.collect()}
    assert a == b


def test_retract_then_ann_never_surfaces_deleted_vectors(
    spark, sf_dir, tmp_path
):
    """GDPR erasure followed by ANN off the lakehouse read: clone a few
    vectors under new ids (cosine 1.0 with their originals — they WOULD
    be rank-1 hits), retract the clones, and assert no retracted id
    appears in any top-k, for brute-force AND the persisted IVF index
    built straight off the lakehouse read."""
    fs = _store(tmp_path)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clones = e.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    fs.materialize(spark, e.unionByName(clones), "emb", run_version=1)
    doomed = clones.select("vec_id")
    fs.retract(spark, "emb", doomed, run_version=2)
    feat = fs.read(spark, "emb").select("vec_id", "embedding")
    queries = feat.where(F.col("vec_id") < 5)
    retracted = {r.vec_id for r in doomed.collect()}

    brute = similarity.cosine_topk(feat, queries, k=5)
    hits = {r.neighbor_id for r in brute.collect()}
    assert not (hits & retracted)

    idx = str(tmp_path / "ivf")
    similarity.ivf_build_index(feat, idx)
    approx = similarity.ivf_query_index(spark, idx, queries, k=5)
    hits2 = {r.neighbor_id for r in approx.collect()}
    assert not (hits2 & retracted)


def test_embedding_group_pit_serve(spark, sf_dir, tmp_path):
    """serve(): labels PIT-join the embedding group — each label row gets
    the vector as of its timestamp, never a future materialization."""
    fs = _store(tmp_path)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fs.materialize(spark, e, "emb", run_version=1)
    labels = spark.createDataFrame(
        [(0, "2024-06-01", 1.0), (1, "2023-06-01", 0.0)],
        "vec_id bigint, label_ts string, y double",
    ).withColumn("label_ts", F.to_timestamp("label_ts"))
    out = fs.serve(spark, labels, label_ts="label_ts", names=["emb"])
    rows = {r.vec_id: r for r in out.collect()}
    # 2024-06 label sees the 2024-01 materialization; 2023-06 predates it
    assert rows[0].embedding is not None
    assert rows[1].embedding is None


def test_embedding_group_retract_is_mor_not_rewrite(spark, sf_dir, tmp_path):
    """Retraction must be merge-on-read (delete files), not a table
    rewrite — erasure write cost scales with the erased rows."""
    fs = _store(tmp_path)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fs.materialize(spark, e, "emb", run_version=1)
    path = fs.groups["emb"].table_path(fs.root)
    files_before = set(iceberg._live_data_files(path))
    fs.retract(
        spark, "emb",
        e.where(F.col("vec_id") % 11 == 0).select("vec_id"),
        run_version=2,
    )
    assert set(iceberg._live_data_files(path)) == files_before  # no rewrite
    meta = iceberg._load_metadata(path)
    cur = meta["current-snapshot-id"]
    assert iceberg._snapshot_content(meta, cur, path)[1]  # delete files live
