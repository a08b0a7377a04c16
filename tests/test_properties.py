"""Property-based checks (hypothesis) — SURVEY.md §5.4 algebraic invariants.

max_examples kept small: each example crosses into the JVM; the properties
target structural invariants, not numeric fuzz.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from feature_store_ml_spark.operators import dedup, windows
from feature_store_ml_spark.operators.asof import asof_join

DOC = st.text(alphabet="ab cd", min_size=0, max_size=40)
SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(DOC, min_size=1, max_size=8))
@SETTINGS
def test_exact_dedup_idempotent_and_subset(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    once = dedup.exact_dedup(df)
    ids = {r.doc_id for r in once.collect()}
    assert ids <= set(range(len(texts)))
    twice = dedup.exact_dedup(once.select("doc_id", "text"))
    assert {r.doc_id for r in twice.collect()} == ids
    # distinct normalized contents == number of survivors
    n_norm = df.select(
        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")).alias("n")
    ).distinct().count()
    assert len(ids) == n_norm


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(0, 50)),
        min_size=1,
        max_size=12,
    )
)
@SETTINGS
def test_asof_join_picks_max_ts_at_or_before(spark, rows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rows)], "k string, ts long, lid int"
    )
    right_rows = sorted({(k, t) for k, t in rows})
    right = spark.createDataFrame(
        [(k, t, float(t)) for k, t in right_rows], "k string, ts long, v double"
    )
    out = asof_join(left, right, on="k", left_ts="ts").collect()
    by_key = {}
    for k, t in right_rows:
        by_key.setdefault(k, []).append(t)
    for r in out:
        candidates = [t for t in by_key.get(r.k, []) if t <= r.ts]
        expected = float(max(candidates)) if candidates else None
        assert r.v == expected, (r, expected)


@given(
    vals=st.lists(st.integers(0, 5), min_size=1, max_size=20),
    k=st.integers(1, 4),
)
@SETTINGS
def test_topk_rank_bounds_and_count(spark, vals, k):
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v int, id int"
    )
    out = windows.top_k_per_group(
        df, [F.lit(1)], [F.col("v").desc(), F.col("id")], k=k
    ).toPandas()
    assert len(out) == min(k, len(vals))
    assert out.rn.between(1, k).all()
    # the selected values are the k largest (as a multiset)
    assert sorted(out.v, reverse=True) == sorted(vals, reverse=True)[: len(out)]


def test_hash_sample_nesting(spark, sf_dir):
    """Threshold sampling is monotone: the 10% sample is a subset of the
    20% sample under the same seed — the property that lets you reuse one
    hash for a whole ladder of sample sizes (seeded df.sample lacks it)."""
    from feature_store_ml_spark.io import load_table
    from feature_store_ml_spark.operators import sampling

    c = load_table(spark, sf_dir, "customer")
    small = {r.c_custkey for r in sampling.hash_sample(c, "c_custkey", 0.1, seed=3).select("c_custkey").collect()}
    big = {r.c_custkey for r in sampling.hash_sample(c, "c_custkey", 0.2, seed=3).select("c_custkey").collect()}
    assert small <= big
    assert len(small) < len(big)


def test_pii_redaction_idempotent(spark):
    """redact(redact(x)) == redact(x): placeholders must not re-match any
    PII pattern (a '[EMAIL]' that looked like a phone would corrupt text
    on every pipeline re-run)."""
    from pyspark.sql import functions as F
    from feature_store_ml_spark.operators import text

    df = spark.createDataFrame(
        [(1, "a@b.io call 555-123-4567 ssn 123-45-6789 ip 10.0.0.1")],
        "doc_id long, text string",
    )
    once = df.select(text.pii_redact(F.col("text")).alias("text"))
    twice = once.select(text.pii_redact(F.col("text")).alias("text"))
    assert once.first().text == twice.first().text


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=40),
    budget=st.integers(min_value=50, max_value=400),
)
@SETTINGS
def test_packing_invariants_random(spark, tokens, budget):
    """FFD packing under random sizes: every doc exactly once; no multi-doc
    shard over budget; any doc alone in an over-budget shard is itself
    over budget (the documented oversized-doc escape hatch)."""
    from feature_store_ml_spark.operators import packing

    df = spark.createDataFrame(list(enumerate(tokens)), "doc_id long, n_tokens long")
    out = packing.pack_documents(df, budget, n_buckets=4).toPandas()
    assert sorted(out.doc_id) == list(range(len(tokens)))
    g = out.groupby("shard_id").agg(tot=("n_tokens", "sum"), n=("n_tokens", "size"))
    over = g[(g.tot > budget)]
    assert (over.n == 1).all()
    solo_over = out[out.shard_id.isin(over.index)]
    assert (solo_over.n_tokens > budget).all()


@given(
    data=st.lists(
        st.lists(
            st.tuples(
                st.sampled_from("pqr"), st.integers(0, 30), st.integers(0, 99)
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_newer_wins_matches_reference_model(spark, tmp_path_factory, data):
    """Conditional MERGE (newer-wins) vs a driver-side reference model:
    after any sequence of keyed batches, the table holds exactly
    max-ts-per-key (strictly-newer replaces; within-batch keys unique by
    construction; (key, ts) pairs globally unique so ties can't make the
    model ambiguous)."""
    from feature_store_ml_spark.io import lakehouse

    seen_kts: set = set()
    batches = []
    for raw in data:
        seen_k: set = set()
        batch = []
        for k, t, v in raw:
            if k in seen_k or (k, t) in seen_kts:
                continue
            seen_k.add(k)
            seen_kts.add((k, t))
            batch.append((k, t, v))
        if batch:
            batches.append(batch)
    if not batches:
        return
    root = str(tmp_path_factory.mktemp("merge")) + "/t"
    model: dict = {}
    for b in batches:
        df = spark.createDataFrame(b, "k string, ts long, v long")
        lakehouse.merge_delta(spark, df, root, keys=["k"], newer_wins_col="ts")
        for k, t, v in b:
            if k not in model or t > model[k][0]:
                model[k] = (t, v)
    got = {r.k: (r.ts, r.v) for r in lakehouse.read_delta(spark, root).collect()}
    assert got == model


# ------------------------------------------------- v3 default round-trips
# (round 12): _default_json and _default_parse are inverses over the
# primitive mapping — the property that keeps a default written by this
# engine readable by this engine (and spec-shaped for foreign readers).


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_default_roundtrip_long(v):
    from feature_store_ml_spark.io import iceberg

    assert iceberg._default_parse("long", iceberg._default_json("long", v)) == v


@settings(max_examples=60, deadline=None)
@given(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)
def test_default_roundtrip_double(v):
    from feature_store_ml_spark.io import iceberg

    assert iceberg._default_parse(
        "double", iceberg._default_json("double", v)
    ) == v


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=40))
def test_default_roundtrip_string(v):
    from feature_store_ml_spark.io import iceberg

    assert iceberg._default_parse(
        "string", iceberg._default_json("string", v)
    ) == v


@settings(max_examples=60, deadline=None)
@given(st.dates())
def test_default_roundtrip_date_and_phys(v):
    import datetime

    from feature_store_ml_spark.io import iceberg

    j = iceberg._default_json("date", v)
    assert iceberg._default_parse("date", j) == v
    assert iceberg._default_phys("date", j) == (
        v - datetime.date(1970, 1, 1)
    ).days


@settings(max_examples=60, deadline=None)
@given(
    st.datetimes(
        min_value=__import__("datetime").datetime(1900, 1, 1),
        max_value=__import__("datetime").datetime(2200, 1, 1),
    )
)
def test_default_roundtrip_timestamp(v):
    from feature_store_ml_spark.io import iceberg

    j = iceberg._default_json("timestamp", v)
    assert iceberg._default_parse("timestamp", j) == v
    # physical micros decode back to the same wall clock
    import datetime

    micros = iceberg._default_phys("timestamp", j)
    assert datetime.datetime(1970, 1, 1) + datetime.timedelta(
        microseconds=micros
    ) == v.replace(microsecond=v.microsecond)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=32))
def test_default_roundtrip_binary(v):
    from feature_store_ml_spark.io import iceberg

    assert iceberg._default_parse(
        "binary", iceberg._default_json("binary", v)
    ) == v


# ---- round 13: nested-type bridge invariants (pure metadata, no JVM) ----

_PRIM = st.sampled_from(
    ["int", "bigint", "float", "double", "boolean", "string",
     "binary", "date", "timestamp", "decimal(12,3)"]
)


def _spark_dt(draw_type):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(draw_type)


_NESTED = st.recursive(
    _PRIM,
    lambda inner: st.one_of(
        inner.map(lambda t: f"array<{t}>"),
        st.tuples(_PRIM, inner).map(lambda kv: f"map<{kv[0]},{kv[1]}>"),
        st.lists(
            st.tuples(st.sampled_from("abcdef"), inner), min_size=1,
            max_size=3, unique_by=lambda kv: kv[0],
        ).map(
            lambda fs: "struct<"
            + ",".join(f"{k}:{t}" for k, t in fs) + ">"
        ),
    ),
    max_leaves=6,
)


@given(type_str=_NESTED)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_nested_type_bridge_roundtrip(spark, type_str):
    """spark type -> iceberg JSON (fresh nested ids) -> spark JSON type
    round-trips structurally, ids are unique, and _max_field_id covers
    every allocated id."""
    import itertools

    from pyspark.sql.types import _parse_datatype_string

    from feature_store_ml_spark.io import iceberg

    dt = _parse_datatype_string(type_str)
    ctr = itertools.count(1)
    ice = iceberg._spark_dt_to_ice(dt, lambda: next(ctr))
    allocated = next(ctr) - 1

    ids: list[int] = []

    def walk(t):
        if not isinstance(t, dict):
            return
        if t["type"] == "list":
            ids.append(t["element-id"])
            walk(t["element"])
        elif t["type"] == "map":
            ids.extend([t["key-id"], t["value-id"]])
            walk(t["key"])
            walk(t["value"])
        elif t["type"] == "struct":
            for f in t["fields"]:
                ids.append(f["id"])
                walk(f["type"])

    walk(ice)
    assert len(ids) == len(set(ids)) == allocated
    fake_field = [{"id": 0, "name": "x", "required": False, "type": ice}]
    assert iceberg._max_field_id(fake_field) == (max(ids) if ids else 0)

    back = iceberg._ice_type_to_spark_json(ice)
    assert back is not None
    from pyspark.sql.types import StructType

    rt = StructType.fromJson(
        {"type": "struct",
         "fields": [{"name": "x", "type": back, "nullable": True,
                     "metadata": {}}]}
    ).fields[0].dataType
    assert rt == dt

    # the id-free fingerprint is stable across fresh-id allocations
    ctr2 = itertools.count(1000)
    ice2 = iceberg._spark_dt_to_ice(dt, lambda: next(ctr2))
    assert iceberg._ice_type_fingerprint(ice) == iceberg._ice_type_fingerprint(ice2)
    assert iceberg._spark_dt_fingerprint(dt) == iceberg._ice_type_fingerprint(ice)
