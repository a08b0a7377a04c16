"""Deterministic sampling (E16), PII scan, and Z-order layout."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import load_table
from feature_store_ml_spark.operators import layout, sampling, text


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_mixture_sample_hits_weights(spark):
    """With large per-source populations the realized mixture must land
    near the requested weights, selection must be layout-independent, and
    unlisted sources must be dropped entirely."""
    rows = spark.range(30_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    out = sampling.mixture_sample(
        rows, "source", "doc_id",
        weights={"s0": 0.6, "s1": 0.4}, target_rows=5_000,
    )
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "s2" not in got  # weight 0 -> dropped
    assert abs(got["s0"] / 5_000 - 0.6) < 0.05
    assert abs(got["s1"] / 5_000 - 0.4) < 0.05
    # layout independence: a repartitioned input selects the same doc_ids
    out2 = sampling.mixture_sample(
        rows.repartition(17), "source", "doc_id",
        weights={"s0": 0.6, "s1": 0.4}, target_rows=5_000,
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_mixture_sample_clamps_underfilled_source(spark):
    rows = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 10, "rare").otherwise("common").alias("source"),
    )
    out = sampling.mixture_sample(
        rows, "source", "doc_id",
        weights={"rare": 0.5, "common": 0.5}, target_rows=80,
    )
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["rare"] == 10  # quota 40 > population 10 -> rate clamps to 1


def test_mixture_sample_validation(spark):
    rows = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("source")
    )
    with pytest.raises(ValueError, match="target_rows"):
        sampling.mixture_sample(rows, "source", "doc_id", {"a": 1.0}, 0)
    with pytest.raises(ValueError, match="negative"):
        sampling.mixture_sample(rows, "source", "doc_id", {"a": -1.0}, 10)
    with pytest.raises(ValueError, match="no overlap"):
        sampling.mixture_sample(rows, "source", "doc_id", {"zzz": 1.0}, 10)

def test_hash_sample_fraction_and_determinism(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = c.count()
    s1 = sampling.hash_sample(c, "c_custkey", 0.2, seed=1)
    k1 = sorted(r.c_custkey for r in s1.select("c_custkey").collect())
    # expected fraction within binomial noise (n>=1500 even at sf0.001)
    assert abs(len(k1) / n - 0.2) < 0.06
    # re-evaluation and a different physical layout give the same set
    k2 = sorted(
        r.c_custkey
        for r in sampling.hash_sample(c.repartition(7), "c_custkey", 0.2, seed=1)
        .select("c_custkey")
        .collect()
    )
    assert k1 == k2
    # different seed gives a (very probably) different set of similar size
    k3 = sorted(
        r.c_custkey
        for r in sampling.hash_sample(c, "c_custkey", 0.2, seed=2)
        .select("c_custkey")
        .collect()
    )
    assert k3 != k1


def test_hash_sample_no_shuffle(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    plan = sampling.hash_sample(c, "c_custkey", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # stateless filter: scan + project only


def test_hash_sample_bounds(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    with pytest.raises(ValueError):
        sampling.hash_sample(c, "c_custkey", 1.5)
    assert sampling.hash_sample(c, "c_custkey", 0.0).count() == 0
    assert sampling.hash_sample(c, "c_custkey", 1.0).count() == c.count()


def test_stratified_exact_n_and_plan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(d, "lang", "doc_id", 3)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_stratum = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(3, per_stratum[lang])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # rank filter pushed into the sort


def test_split_partitions_all_rows_and_is_stable(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    s = sampling.deterministic_split(o, "o_custkey", 0.25)
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    assert counts["train"] + counts["test"] == o.count()
    # entity coherence: every customer's orders land in exactly one split
    leak = (
        s.groupBy("o_custkey")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert leak == 0


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_pii_known_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@sub.example.org now"),
            (2, "call 555-123-4567 or 555.987.6543"),
            (3, "ssn 123-45-6789 ip 192.168.0.1"),
            (4, "clean text, nothing here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.pii_scan(df).collect()}
    assert (out[1].n_email, out[1].n_pii) == (1, 1)
    assert out[1].redacted == "mail [EMAIL] now"
    assert (out[2].n_phone, out[2].n_pii) == (2, 2)
    assert out[2].redacted == "call [PHONE] or [PHONE]"
    assert (out[3].n_ssn, out[3].n_ipv4) == (1, 1)
    assert out[3].redacted == "ssn [SSN] ip [IPV4]"
    assert out[4].n_pii == 0 and out[4].redacted == "clean text, nothing here"


def test_pii_ssn_not_eaten_by_phone(spark):
    # 3-2-4 digit groups are an SSN, 3-3-4 a phone; neither matches the other
    df = spark.createDataFrame(
        [(1, "a 111-22-3333 b 444-555-6666")], "doc_id long, text string"
    )
    r = text.pii_scan(df).first()
    assert (r.n_ssn, r.n_phone) == (1, 1)
    assert r.redacted == "a [SSN] b [PHONE]"


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------

def test_zorder_key_known_bits(spark):
    # x=3 (0b11), y=0 with bits=2 over domain [0,3]: scaled x=3,y=0 →
    # interleave: x bits at even positions → zkey = 0b0101 = 5
    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], "x int, y int")
    out = {(r.x, r.y): r._zkey for r in layout.zorder_key(df, ["x", "y"], bits=2).collect()}
    assert out[(0, 0)] == 0
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(3, 3)] == 0b1111


def test_zorder_layout_clusters_both_dims(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(10_000), rng.randrange(10_000)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    z = layout.zorder_layout(df, ["x", "y"], n_partitions=16, bits=10)

    spans = (
        z.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    # every z-partition must be tight in BOTH dimensions vs the 10k global
    # span (a single-column sort would leave the other dimension at ~10k).
    avg_sx = sum(r.sx for r in spans) / len(spans)
    avg_sy = sum(r.sy for r in spans) / len(spans)
    assert avg_sx < 6_000 and avg_sy < 6_000, (avg_sx, avg_sy)
    assert sum(r.n for r in spans) == 20_000


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError):
        layout.zorder_key(df, [], bits=4)
    with pytest.raises(ValueError):
        layout.zorder_key(df, ["x"], bits=64)


def test_empty_input_edges(spark):
    """New operators must not blow up on empty inputs (a real pipeline's
    first day, an empty partition, a filter that matched nothing)."""
    from feature_store_ml_spark.operators import dedup, packing, sampling
    from feature_store_ml_spark.operators import features as FE

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.decontaminate(empty_docs, empty_docs).count() == 0

    empty_tok = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert packing.pack_documents(empty_tok, 128).count() == 0

    empty_c = spark.createDataFrame([], "c_custkey long, c_acctbal double")
    assert sampling.hash_sample(empty_c, "c_custkey", 0.5).count() == 0
    assert sampling.stratified_sample(empty_c, "c_acctbal", "c_custkey", 3).count() == 0

    empty_ts = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert FE.resample_ffill(empty_ts, ["user_id"], "ts", ["value"]).count() == 0


def test_zorder_parquet_rowgroup_skipping(spark, tmp_path):
    """End-to-end proof of the z-order claim: after writing the clustered
    layout as parquet, BOTH columns' per-file min/max stats are tight, so a
    range predicate on either column can skip most files (parquet readers
    prune on exactly these stats)."""
    import pyarrow.parquet as pq
    import random, glob

    rng = random.Random(11)
    rows = [(rng.randrange(10_000), rng.randrange(10_000)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = str(tmp_path / "z")
    layout.zorder_layout(df, ["x", "y"], n_partitions=16, bits=10).write.parquet(out)

    spans = {"x": [], "y": []}
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                spans[name].append(st.max - st.min)
    for name, ss in spans.items():
        avg = sum(ss) / len(ss)
        # global span is ~10k; clustered row groups must be far tighter
        assert avg < 6_000, (name, avg)

    # control: a layout sorted on x alone leaves y unclustered
    ctrl = str(tmp_path / "ctrl")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(ctrl)
    y_spans = []
    for f in glob.glob(f"{ctrl}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "y":
                    y_spans.append(col.statistics.max - col.statistics.min)
    assert sum(y_spans) / len(y_spans) > 9_000  # un-z-ordered: full range
