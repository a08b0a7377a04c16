"""Local replica of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle, compare row-count + schema-width +
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from feature_store_ml_spark import queries as catalog  # noqa: E402
from feature_store_ml_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes enough to hash values."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(canon(df), index=False).sum())


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if vanilla:
        # driver-robustness mode: the driver supplies its OWN session —
        # bare confs, non-UTC timezone. Every query must still hash-match.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.shuffle.partitions", "8")
            .appName("oracle_check_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle_check")
    q = catalog.queries()
    o = catalog.oracle_sql()

    failures = []
    results: dict[str, dict] = {}
    for name, fn in q.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            failures.append(name)
            results[name] = {"err": "spark_raised"}
            continue
        if name not in o:
            print(f"rows-only  {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            if len(sdf) == 0 and name != "e3_join_anti":
                print(f"  WARN: zero rows")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            ddf = con.sql(o[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb oracle raised")
            traceback.print_exc()
            failures.append(name)
            results[name] = {"err": "oracle_raised"}
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount {len(sdf)} vs {len(ddf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, ddf.columns)):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems:
            cs, cd = canon(sdf), canon(ddf)
            if value_hash(cs) != value_hash(cd):
                problems.append("value-hash mismatch")
                diff = cs.compare(cd) if cs.shape == cd.shape else None
                if diff is not None and not diff.empty:
                    print(diff.head(10))
        status = "ok   " if not problems else "FAIL "
        print(f"{status} {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s) {'; '.join(problems)}")
        if problems:
            failures.append(name)
        results[name] = {
            "rows_match": len(sdf) == len(ddf),
            "schema_match": not any(p.startswith("columns") for p in problems),
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(ddf),
            "err": "; ".join(problems) or None,
        }

    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=2)
        print(f"wrote {json_out}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
