"""Module-header honesty gate (round 11, VERDICT r10 item 3): the
io/lakehouse.py and io/iceberg.py module docstrings document their
remaining refusals, and twice now they drifted stale — claiming gaps
that had been implemented rounds earlier (ID-mode mapping,
v2Checkpoints; "parquet data files only"). This test binds each header
to STATUS.md's canonical "Remaining loud refusals" inventory: every
refusal theme a header claims must appear in the inventory, and the
formerly-stale claims must never reappear. Runtime-free (pure text)."""

import ast
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _header(mod: str) -> str:
    src = (ROOT / "feature_store_ml_spark" / "io" / mod).read_text()
    doc = ast.get_docstring(ast.parse(src))
    assert doc, f"{mod}: missing module docstring"
    return doc


def _inventory() -> str:
    s = (ROOT / "STATUS.md").read_text()
    m = re.search(r"\*\*Remaining loud refusals\*\*(.*?)\n\n", s, re.S)
    assert m, "STATUS.md lost its 'Remaining loud refusals' inventory"
    return m.group(1).lower()


#: claims that were once true, got fixed, and MUST stay out of headers
_STALE = {
    "iceberg.py": [
        "parquet data files only",
        "256 mib",
        "driver-decode",  # eq-delete decode is distributed since round 11
    ],
    "lakehouse.py": [
        "remaining fail-loud gaps: column-mapping id mode",
        "v2checkpoints, non-hive partition layouts",
    ],
}

#: refusal themes each header claims — every one must be backed by the
#: STATUS.md inventory (a header inventing a refusal STATUS doesn't know
#: is the same bug in the other direction)
_CLAIMED = {
    "iceberg.py": ["zoneless", "branch", "format-version"],
    "lakehouse.py": ["decimal", "identity", "column mapping"],
}


def test_headers_carry_no_stale_claims():
    for mod, phrases in _STALE.items():
        doc = _header(mod).lower()
        for p in phrases:
            assert p not in doc, (
                f"{mod} header still claims {p!r} — refresh it against "
                "STATUS.md's refusal inventory"
            )


def test_header_refusals_backed_by_status_inventory():
    inv = _inventory()
    for mod, themes in _CLAIMED.items():
        doc = _header(mod).lower()
        for t in themes:
            assert t in doc, (
                f"{mod} header dropped the {t!r} refusal — if it was "
                "implemented, update STATUS.md and this test together"
            )
            assert t in inv, (
                f"{mod} header claims a {t!r} refusal that STATUS.md's "
                "inventory does not list — one of them is stale"
            )


def test_headers_point_at_canonical_inventory():
    for mod in _STALE:
        doc = _header(mod)
        assert "STATUS.md" in doc, (
            f"{mod} header must reference STATUS.md's refusal inventory"
        )
