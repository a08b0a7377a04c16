"""Corpus-drift canary: the driver regenerates /root/testdata between
rounds and has already changed a physical type under us once (events.ts
INT64-nanos → native timestamp[us], which silently broke 19 queries).
This test turns the next such drift into a red pytest line instead of a
page of red driver rows: every table must load through ``load_table`` with
exactly the dtypes the engine contract (``schemas.TABLES``) declares.
"""

from feature_store_ml_spark import schemas
from feature_store_ml_spark.io import load_table


def test_load_table_matches_declared_schema(spark, sf_dir):
    mismatches = []
    for name, declared in schemas.TABLES.items():
        df = load_table(spark, sf_dir, name)
        got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
        if got != want:
            mismatches.append((name, got, want))
    assert not mismatches, "\n".join(
        f"{n}: loaded {g}\n   declared {w}" for n, g, w in mismatches
    )


def test_events_ts_values_sane(spark, sf_dir):
    """Beyond the dtype: the VALUES must land in the corpus's real range.
    The round-3 streaming bug produced the right dtype with values ~1000x
    compressed — a value-range check is what catches unit errors."""
    import datetime

    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    assert lo.year >= 2000, f"min ts {lo} — unit error (epoch-ish value)?"
    assert (hi - lo) >= datetime.timedelta(days=1), (
        f"events span {hi - lo} — timestamps look compressed"
    )
