"""Bench a subset of catalog queries with bench.py's exact methodology
(same session factory, same warm-up, noop sink, best-of-2). For quick
A/B measurement during optimization work.

Usage: python tools/bench_subset.py q1_pricing_summary e5_window_rank ...
       python tools/bench_subset.py --runs 3 <names...>
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_ml_spark import queries as catalog  # noqa: E402
from feature_store_ml_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_subset")
    q = catalog.queries()
    q["e6_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for t in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        spark.read.parquet(t).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in args:
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        print(f"{name}: {times[name]}", file=sys.stderr)
    print(json.dumps({"queries": times, "total": round(sum(times.values()), 3)}))


if __name__ == "__main__":
    main()
