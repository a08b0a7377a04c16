"""Profile one catalog query: wall time + driver-side cProfile hotspots.

Usage: python tools/profile_query.py <query_name> [runs]

Runs the query through the same noop-sink methodology as bench.py (after
the same warm-up), then re-runs it under cProfile and prints the top
driver-side functions by cumulative time. py4j socket reads ≈ JVM job
time; everything else is driver Python.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_ml_spark import queries as catalog  # noqa: E402
from feature_store_ml_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    q = catalog.queries()
    q["e6_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times = []
    for _ in range(runs):
        t0 = time.time()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    print(f"{name}: runs={times} best={min(times)}")

    pr = cProfile.Profile()
    pr.enable()
    q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
