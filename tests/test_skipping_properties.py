"""Property-based SOUNDNESS harness for the data-skipping evaluator
(io/skipping.py): for ANY conjunction the grammar can produce, a file
containing at least one matching row must NEVER be pruned — wrongly
skipped files silently lose rows, which is the one failure mode the
whole design exists to rule out. Expected matches are computed by
DuckDB per file, so each hypothesis example costs milliseconds (no
Spark job in the loop)."""

import datetime
import json

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse, skipping


@pytest.fixture(scope="module")
def skip_table(spark, tmp_path_factory):
    """One Delta table, 8 files, mixed types WITH nulls and collisions —
    built once; per-file pandas frames ride along for the oracle."""
    root = str(tmp_path_factory.mktemp("skipprop") / "t")
    df = (
        spark.range(0, 400)
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 11 == 0, None)
            .otherwise((F.col("id") % 50).cast("long"))
            .alias("m"),
            F.when(F.col("id") % 13 == 0, None)
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 30).cast("string")))
            .alias("s"),
            F.date_add(
                F.lit("2024-01-01").cast("date"), (F.col("id") % 90).cast("int")
            ).alias("d"),
            (F.col("id").cast("double") / 7.0).alias("x"),
        )
        .repartitionByRange(8, "k")
    )
    lakehouse.write_delta(spark, df, root)
    adds, meta = lakehouse._replay_log_adds(root)
    frames = {
        rel: pd.read_parquet(f"{root}/{rel}") for rel in adds
    }
    return adds, meta, frames


_NUM_LITS = st.sampled_from([-1, 0, 3, 7, 25, 49, 50, 120, 399, 400])
_STR_LITS = st.sampled_from(["s0", "s1", "s15", "s29", "s3", "zzz", ""])
_DATE_LITS = st.sampled_from(
    ["2023-12-31", "2024-01-01", "2024-02-15", "2024-03-30", "2024-06-01"]
)
_FLOAT_LITS = st.sampled_from([-0.5, 0.0, 3.14, 28.4, 57.0, 100.0])


def _sql_lit(col, v):
    if col == "s":
        return "'" + str(v) + "'"
    if col == "d":
        return f"DATE '{v}'"
    return str(v)


@st.composite
def conjunct(draw):
    col = draw(st.sampled_from(["k", "m", "s", "d", "x"]))
    lits = {"k": _NUM_LITS, "m": _NUM_LITS, "s": _STR_LITS,
            "d": _DATE_LITS, "x": _FLOAT_LITS}[col]
    kind = draw(st.sampled_from(
        ["cmp", "between", "in", "isnull", "notnull", "like"]
    ))
    if kind == "cmp":
        op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
        return f"{col} {op} {_sql_lit(col, draw(lits))}"
    if kind == "between":
        a, b = draw(lits), draw(lits)
        if col != "s" and not isinstance(a, str):
            a, b = min(a, b), max(a, b)
        return f"{col} BETWEEN {_sql_lit(col, a)} AND {_sql_lit(col, b)}"
    if kind == "in":
        vals = draw(st.lists(lits, min_size=1, max_size=3))
        return f"{col} IN ({', '.join(_sql_lit(col, v) for v in vals)})"
    if kind == "isnull":
        return f"{col} IS NULL"
    if kind == "notnull":
        return f"{col} IS NOT NULL"
    return f"s LIKE '{draw(st.sampled_from(['s1', 's2', 'z']))}%'"


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(conjuncts=st.lists(conjunct(), min_size=1, max_size=3))
def test_skipping_never_drops_a_file_with_matching_rows(skip_table, conjuncts):
    adds, meta, frames = skip_table
    predicate = " AND ".join(conjuncts)
    kept, _skipped = skipping.prune_adds(adds, meta, predicate)
    con = duckdb.connect()
    try:
        for rel, pdf in frames.items():
            con.register("f", pdf)
            try:
                n = con.sql(f"SELECT count(*) FROM f WHERE {predicate}").fetchone()[0]
            finally:
                con.unregister("f")
            if n > 0:
                assert rel in kept, (
                    f"file {rel} holds {n} matching rows for {predicate!r} "
                    f"but was pruned — stats: {adds[rel].get('stats')}"
                )
    finally:
        con.close()


@settings(max_examples=60, deadline=None)
@given(conjuncts=st.lists(conjunct(), min_size=1, max_size=3))
def test_parser_total_on_grammar(conjuncts):
    """The parser never crashes on the grammar and, when it parses,
    yields only recognized ops."""
    out = skipping.parse_conjuncts(" AND ".join(conjuncts))
    if out is not None:
        for col, op, _lit in out:
            assert op in ("=", "!=", "<", "<=", ">", ">=", "in",
                          "isnull", "notnull", "prefix")
            assert col in ("k", "m", "s", "d", "x")


_AGREEMENT_PREDICATES = [
    "k = 7",
    "k >= 120 AND m < 25",
    "s = 's15'",
    "s LIKE 's1%' AND k < 399",
    "d BETWEEN DATE '2024-01-01' AND DATE '2024-02-15'",
    "m IS NULL",
    "s IS NOT NULL AND x > 28.4",
    "k IN (3, 7, 400)",
    "x <= 0.0",
    "m != 25 AND d > DATE '2024-03-30'",
    "k BETWEEN 50 AND 120 AND s IN ('s0', 'zzz')",
    "x >= 57.0 AND m IS NOT NULL AND k > 0",
]


def test_distributed_prune_agrees_with_driver_path(spark, skip_table):
    """The Spark-job evaluation (prune_adds_distributed) must make the
    IDENTICAL keep/skip decision as the driver loop for every predicate —
    same evaluator, different execution. Soundness of the driver path is
    hypothesis-tested above; agreement transfers it to the job path."""
    adds, meta, _frames = skip_table
    for pred in _AGREEMENT_PREDICATES:
        kept_d, skipped_d = skipping.prune_adds(adds, meta, pred)
        kept_j, skipped_j = skipping.prune_adds_distributed(
            spark, adds, meta, pred
        )
        assert set(kept_d) == set(kept_j), pred
        assert skipped_d == skipped_j, pred
        # auto dispatch below threshold = driver decisions too
        kept_a, _ = skipping.prune_adds_auto(spark, adds, meta, pred)
        assert set(kept_a) == set(kept_d), pred


def test_distributed_prune_at_inflated_file_count(spark, skip_table):
    """Scale shape: synthesize a 30k-file snapshot (stats fabricated from
    the 8 real files, shifted ranges) and check the job path agrees with
    the driver path file-for-file — the 10^6-file planning story in
    miniature. Also exercises auto dispatch ABOVE the threshold."""
    adds, meta, _frames = skip_table
    base = next(iter(adds.values()))
    big = {}
    for i in range(30_000):
        st_json = {
            "numRecords": 50,
            "minValues": {"k": i * 50, "m": 0, "x": 0.0},
            "maxValues": {"k": i * 50 + 49, "m": 49, "x": 57.0},
            "nullCount": {"k": 0, "m": 5, "x": 0},
        }
        big[f"part-{i:06d}.parquet"] = {
            **{k: v for k, v in base.items() if k != "stats"},
            "path": f"part-{i:06d}.parquet",
            "stats": json.dumps(st_json),
        }
    pred = "k >= 1200000 AND k < 1200500 AND m < 10"
    kept_d, skipped_d = skipping.prune_adds(big, meta, pred)
    kept_j, skipped_j = skipping.prune_adds_auto(
        spark, big, meta, pred, threshold=10_000
    )
    assert set(kept_d) == set(kept_j)
    assert skipped_d == skipped_j
    # the predicate names 500 k-values spread over 10 files; pruning must
    # bite hard on both paths
    assert len(kept_j) <= 11
