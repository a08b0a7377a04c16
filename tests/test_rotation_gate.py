"""Rotation gate (ADVICE r4): queries rotated OUT of the driver's 50-query
verification window lose external correctness coverage, so the local sweep
(tools/check_oracle.py --json CORRECTNESS_LOCAL.json) is their only hash
check. This test makes that sweep a HARD gate: every oracle-backed query
outside the window must be present AND green in the committed sweep
artifact — a stale or red artifact fails the suite, so a regression in a
rotated-out query cannot land silently.

(New queries enter the registry in-window by rotation policy, so a fresh
query missing from a not-yet-rerun artifact doesn't trip this; anything
already rotated out has by definition been swept at least once.)
"""

import json
import os

from feature_store_ml_spark import queries as catalog

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_LOCAL.json")


def _load_results() -> dict:
    with open(ARTIFACT, encoding="utf-8") as fh:
        doc = json.load(fh)
    return doc.get("results", doc)  # tool nests under "results"


def test_rotated_out_queries_are_swept_and_green():
    local = _load_results()
    names = list(catalog.queries())
    oracled = set(catalog.oracle_sql())
    tail_oracled = [n for n in names[50:] if n in oracled]
    missing = [n for n in tail_oracled if n not in local]
    assert not missing, (
        f"rotated-out oracle-backed queries missing from the local sweep "
        f"artifact: {missing} — rerun tools/check_oracle.py --json "
        "CORRECTNESS_LOCAL.json before closing the round"
    )
    red = [
        n
        for n in tail_oracled
        if not (
            local[n].get("rows_match")
            and local[n].get("schema_match")
            and local[n].get("hash_match")
        )
    ]
    assert not red, f"rotated-out queries failing the local hash gate: {red}"


def test_sweep_artifact_not_red_anywhere():
    """The sweep artifact must carry no failures at all — red entries for
    in-window queries would mean the driver gate is about to fail too."""
    local = _load_results()
    red = []
    for n, r in local.items():
        if r.get("err") == "no_oracle":  # rows-only by design: ran = green
            if r.get("spark_rows") is None:
                red.append(n)
        elif r.get("err") or not (
            r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
        ):
            red.append(n)
    assert not red, f"local sweep artifact records failures: {red}"
