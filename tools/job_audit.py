"""Job-level audit of one catalog query: every Spark job it runs, with
duration, task count and description — the local stand-in for the Spark
UI's Jobs page (guide §7.1) since the bench session runs with the UI off.

Usage: python tools/job_audit.py <query_name> [<query_name> ...]

Starts a session WITH the UI enabled, warms up, runs each query once
(noop sink, guide §1.4), then dumps per-job rows from the UI REST API.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_ml_spark import queries as catalog  # noqa: E402
from feature_store_ml_spark.session import get_spark  # noqa: E402


def jobs_since(ui: str, app: str, first_id: int) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        alljobs = json.load(r)
    return sorted(
        (j for j in alljobs if j["jobId"] >= first_id),
        key=lambda j: j["jobId"],
    )


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job_audit", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    q = catalog.queries()
    q["e6_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        # one untimed run first so JIT/codegen warm-up doesn't skew job times
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
            first_id = max((j["jobId"] for j in json.load(r)), default=-1) + 1
        t0 = time.time()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = jobs_since(ui, app, first_id)
        tot = 0.0
        print(f"\n=== {name}: wall={wall:.3f}s jobs={len(jobs)} ===")
        for j in jobs:
            t1 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t2 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            frac1 = float(j["submissionTime"][19:23]) if j["submissionTime"][19] == "." else 0
            frac2 = float(j["completionTime"][19:23]) if j["completionTime"][19] == "." else 0
            dur = time.mktime(t2) - time.mktime(t1) + (frac2 - frac1)
            tot += dur
            desc = (j.get("description") or j["name"])[:110]
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s tasks={j['numTasks']:>4} {desc}"
            )
        print(f"  sum(job durations)={tot:.3f}s  (gap to wall = driver-side)")


if __name__ == "__main__":
    main()
