"""One-off idle best-of-5 re-read of the round-13 pin breaches.

VERDICT r13 item 4: q21_sole_late_supplier read 1.813 vs 1.00 pin, and
e1_iceberg_partition_transforms read 4.256 vs 3.61 pin (1.18x, hot-session
suspect). Re-measure idle on the r14 tree, best-of-5, same warm-up protocol
as bench.py.
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

TARGETS = ["q21_sole_late_supplier", "e1_iceberg_partition_transforms"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("adjudicate")
    q = catalog.queries()
    q["e6_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for t in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        spark.read.parquet(t).write.format("noop").mode("overwrite").save()
    out = {}
    for name in TARGETS:
        runs = []
        for _ in range(5):
            t0 = time.time()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"runs": runs, "best": min(runs)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
