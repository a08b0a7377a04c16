"""Capture plan evidence for OPTIMIZATION rounds: for each named query,
the pre-execution `.explain("formatted")` AND the post-execution
(AQE-final) executed plan, plus the job/task structure (job count and
per-job task counts from the UI REST API — durations are noisy, the
STRUCTURE is what the optimizations change).

Usage: PYTHONPATH=<tree> python tools/plan_capture.py <outdir> <suffix> <query...>
"""

from __future__ import annotations

import io
import json
import os
import sys
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.environ.get("PLAN_TREE", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from feature_store_ml_spark import queries as catalog  # noqa: E402
from feature_store_ml_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId
    q = catalog.queries()
    q["e6_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/jobs"
        ) as r:
            first = max((j["jobId"] for j in json.load(r)), default=-1) + 1
        df = q[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        pre = buf.getvalue()
        df.write.format("noop").mode("overwrite").save()
        post = df._jdf.queryExecution().executedPlan().toString()
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/jobs"
        ) as r:
            jobs = sorted(
                (j for j in json.load(r) if j["jobId"] >= first),
                key=lambda j: j["jobId"],
            )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"# {name} ({suffix}) — plan evidence\n")
            fh.write(
                f"# jobs run by one invocation: {len(jobs)}; "
                "per-job task counts (structure, not timing):\n"
            )
            for j in jobs:
                fh.write(
                    f"#   job tasks={j['numTasks']:>4} "
                    f"{(j.get('description') or j['name'])[:100]}\n"
                )
            fh.write("\n== returned frame, explain('formatted') ==\n")
            fh.write(pre)
            fh.write("\n== returned frame, POST-execution (AQE-final) ==\n")
            fh.write(post)
        print(f"captured {name} ({len(jobs)} jobs)")


if __name__ == "__main__":
    main()
