"""Per-file statistics + data skipping for the Delta fallback path.

Delta's scan-time data skipping (the `stats` field on `add` actions —
PROTOCOL.md §Per-file-Statistics) is THE mechanism that makes a selective
query on a 100 TB table read megabytes instead of terabytes: every data
file carries numRecords / minValues / maxValues / nullCount, and the scan
planner drops whole files whose bounds prove the predicate cannot match
before a single byte of data is read. Partition pruning removes
directories; data skipping removes files WITHIN a partition — with a
Z-ordered layout (operators/layout.py) both dimensions of a 2-D predicate
prune multiplicatively.

Two halves, both driver-side metadata work:

- ``collect_file_stats``: read a parquet FOOTER (KBs, not the data) and
  fold its row-group statistics into the Delta stats JSON. This runs in
  the commit phase next to the O(#files) renames the fallback writer
  already does; a cluster deployment computes the same numbers on the
  executors during the write (delta-spark's stats collection) — the JSON
  that lands in the log is identical either way.
- ``prune_adds``: given a snapshot's add actions and a predicate string,
  return only the files that MAY contain matching rows. Conservative by
  construction: a file is skipped only when its stats PROVE no row can
  match; files without stats, unparseable conjuncts, and top-level ORs
  all fail open (keep the file). The full predicate is still applied as a
  normal Spark filter after the scan, so skipping can only ever remove
  provably-dead IO — never rows.

Eligible predicate shape (mirrors delta-spark's data-skipping-eligible
expressions): a top-level conjunction of
``col <op> literal`` (=, !=, <>, <, <=, >, >=), ``col BETWEEN a AND b``,
``col IN (...)``, ``col IS [NOT] NULL`` — over int/long/float/double/
decimal/string/date/timestamp/boolean columns. Anything else simply
contributes no skipping.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import re

__all__ = [
    "footer_column_stats",
    "collect_file_stats",
    "parse_conjuncts",
    "compile_conjuncts",
    "file_may_match",
    "prune_adds",
    "prune_adds_distributed",
    "prune_adds_auto",
]

# ---------------------------------------------------------------------------
# stats collection (write side)
# ---------------------------------------------------------------------------

_MAX_STRING_STAT = 256  # don't bloat the log with book-sized bounds


def _json_stat_value(v, *, is_min: bool):
    """Serialize one bound into Delta's stats JSON, widening where the
    serialization could round (a widened bound is still a valid bound; a
    narrowed one silently skips live rows)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None  # NaN/Inf bounds are not usable for skipping
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return None  # binary columns carry no usable bounds
    if isinstance(v, str):
        if len(v) > _MAX_STRING_STAT:
            if is_min:
                return v[:_MAX_STRING_STAT]  # prefix <= v: valid min
            return None  # a valid truncated MAX needs char+1 surgery; drop
        return v
    try:  # Decimal and friends: float conversion can round either way —
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            if decimal.Decimal(repr(f)) == v:
                return f
            return math.nextafter(f, -math.inf) if is_min else math.nextafter(f, math.inf)
    except Exception:
        pass
    return None


def footer_column_stats(file_path: str):
    """Raw per-column statistics from a parquet FOOTER (KBs of metadata,
    never the data): ``(num_rows, {col: {"min", "max", "nulls"}})`` over
    top-level leaf columns, or None when the footer is unreadable. Bounds
    are folded across row groups and omitted (None) unless EVERY row group
    either reports them or holds zero non-null values — a group that
    merely omitted stats could hold the true extreme. Shared by the Delta
    stats writer (JSON) and the Iceberg manifest writer (binary bounds)."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(file_path).metadata
    except Exception:
        return None
    per_col: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaf — top-level skipping only
                continue
            per_col.setdefault(name, []).append(col.statistics)
    out: dict[str, dict] = {}
    for name, stats_list in per_col.items():
        if any(s is None for s in stats_list):
            continue
        entry: dict = {"min": None, "max": None, "nulls": None}
        if all(s.null_count is not None for s in stats_list):
            entry["nulls"] = sum(s.null_count for s in stats_list)
        have_bounds = [s for s in stats_list if s.has_min_max]
        if have_bounds and all(
            s.has_min_max or getattr(s, "num_values", None) == 0
            for s in stats_list
        ):
            try:
                entry["min"] = min(s.min for s in have_bounds)
                entry["max"] = max(s.max for s in have_bounds)
            except Exception:
                # TypeError: bounds of incomparable python types;
                # ArrowNotImplementedError: pyarrow cannot materialize
                # min/max for some physical types (decimals) — fail open
                # with no bounds either way, never a failed write
                pass
        out[name] = entry
    return md.num_rows, out


def collect_file_stats(file_path: str) -> str | None:
    """Fold a parquet file's row-group statistics into Delta's stats JSON
    string (numRecords / minValues / maxValues / nullCount over top-level
    leaf columns). Footer-only: reads KBs of metadata, never the data.
    Returns None when the footer is unreadable (caller commits the add
    without stats — skipping fails open for that file)."""
    raw = footer_column_stats(file_path)
    if raw is None:
        return None
    num_records, cols = raw
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for name, entry in cols.items():
        if entry["nulls"] is not None:
            nulls[name] = entry["nulls"]
        jlo = _json_stat_value(entry["min"], is_min=True)
        jhi = _json_stat_value(entry["max"], is_min=False)
        if jlo is not None:
            mins[name] = jlo
        if jhi is not None:
            maxs[name] = jhi
    out: dict = {"numRecords": num_records}
    if mins:
        out["minValues"] = mins
    if maxs:
        out["maxValues"] = maxs
    if nulls:
        out["nullCount"] = nulls
    return json.dumps(out, separators=(",", ":"))


# ---------------------------------------------------------------------------
# predicate parsing (read side)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^']|'')*')
      | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*|`[^`]+`)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IS", "NULL", "IN", "BETWEEN", "DATE",
             "TIMESTAMP", "TRUE", "FALSE", "LIKE"}


def _tokenize(text: str) -> list[tuple[str, str]] | None:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            return None
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "word":
            up = val.upper()
            if up in _KEYWORDS:
                tokens.append(("kw", up))
            else:
                tokens.append(("ident", val.strip("`")))
        elif kind == "string":
            tokens.append(("str", val[1:-1].replace("''", "'")))
        elif kind == "number":
            tokens.append(("num", val))
        else:
            tokens.append((kind, val))
    return tokens


class _P:
    """Token cursor."""

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t


def _parse_literal(p: _P):
    """Returns ('num'|'str'|'date'|'ts'|'bool'|'null', value) or None."""
    kind, val = p.peek()
    if kind == "num":
        p.next()
        try:
            return ("num", int(val))
        except ValueError:
            return ("num", float(val))
    if kind == "str":
        p.next()
        return ("str", val)
    if kind == "kw" and val in ("TRUE", "FALSE"):
        p.next()
        return ("bool", val == "TRUE")
    if kind == "kw" and val == "NULL":
        p.next()
        return ("null", None)
    if kind == "kw" and val in ("DATE", "TIMESTAMP"):
        p.next()
        k2, v2 = p.next()
        if k2 != "str":
            return None
        return ("date" if val == "DATE" else "ts", v2)
    return None


def _parse_conjunct(p: _P):
    """One skipping-eligible conjunct, or the string '?' when the conjunct
    is well-formed-enough to step over but not eligible, or None on a
    structure we cannot safely step over."""
    kind, val = p.peek()
    if kind == "lparen":
        # parenthesized sub-expression: consume balanced parens; eligible
        # only if it contains no top-level OR inside — recurse
        p.next()
        depth = 1
        inner = []
        while depth:
            k, v = p.next()
            if k is None:
                return None
            if k == "lparen":
                depth += 1
            elif k == "rparen":
                depth -= 1
                if depth == 0:
                    break
            inner.append((k, v))
        sub = _parse_all(_P(inner))
        return sub if sub is not None else "?"
    if kind != "ident":
        return None
    col = val
    p.next()
    kind, val = p.peek()
    if kind == "lparen":
        # function call `f(...)`: step over the balanced parens and an
        # optional trailing comparison — this conjunct contributes no
        # skipping but must not disable the others
        p.next()
        depth = 1
        while depth:
            k, _ = p.next()
            if k is None:
                return None
            if k == "lparen":
                depth += 1
            elif k == "rparen":
                depth -= 1
        k, _ = p.peek()
        if k == "op":
            p.next()
            if _parse_literal(p) is None:
                return None
        return "?"
    if kind == "op":
        p.next()
        lit = _parse_literal(p)
        if lit is None:
            return None
        op = {"<>": "!=", "=": "="}.get(val, val)
        return [(col, op, lit)]
    if kind == "kw" and val == "IS":
        p.next()
        k2, v2 = p.next()
        if (k2, v2) == ("kw", "NOT"):
            k3, v3 = p.next()
            if (k3, v3) != ("kw", "NULL"):
                return None
            return [(col, "notnull", None)]
        if (k2, v2) == ("kw", "NULL"):
            return [(col, "isnull", None)]
        return None
    if kind == "kw" and val == "BETWEEN":
        p.next()
        lo = _parse_literal(p)
        k2, v2 = p.next()
        if lo is None or (k2, v2) != ("kw", "AND"):
            return None
        hi = _parse_literal(p)
        if hi is None:
            return None
        return [(col, ">=", lo), (col, "<=", hi)]
    if kind == "kw" and val == "IN":
        p.next()
        k2, _ = p.next()
        if k2 != "lparen":
            return None
        vals = []
        while True:
            lit = _parse_literal(p)
            if lit is None:
                return None
            vals.append(lit)
            k3, _ = p.next()
            if k3 == "rparen":
                break
            if k3 != "comma":
                return None
        return [(col, "in", vals)]
    if kind == "kw" and val == "LIKE":
        # prefix LIKE 'abc%' is range-convertible; anything else ineligible
        p.next()
        lit = _parse_literal(p)
        if lit is None:
            return None
        if lit[0] == "str":
            s = lit[1]
            if s and "%" not in s[:-1] and "_" not in s and s.endswith("%"):
                prefix = s[:-1]
                if prefix:
                    return [(col, "prefix", ("str", prefix))]
        return "?"
    return None


def _parse_all(p: _P):
    """Parse a full AND-chain; None => predicate ineligible for skipping."""
    conjuncts: list = []
    while True:
        c = _parse_conjunct(p)
        if c is None:
            return None
        if c != "?":
            conjuncts.extend(c)
        kind, val = p.peek()
        if kind is None:
            return conjuncts
        if (kind, val) == ("kw", "AND"):
            p.next()
            continue
        if (kind, val) == ("kw", "OR"):
            return None  # top-level OR: no per-conjunct skipping is sound
        return None


def parse_conjuncts(where: str):
    """Parse a predicate string into skipping conjuncts
    ``[(col, op, (littype, litval)), ...]``. Returns None when the
    predicate is ineligible (skipping must be skipped entirely)."""
    toks = _tokenize(where)
    if toks is None:
        return None
    out = _parse_all(_P(toks))
    if out == []:
        return None  # nothing eligible — same as ineligible
    return out


# ---------------------------------------------------------------------------
# evaluation (read side)
# ---------------------------------------------------------------------------


def _coerce(littype: str, litval, spark_type: str):
    """Coerce a parsed literal to the comparison domain of a column's
    declared Spark type. Returns (value, domain) or None when the pair is
    not comparable (caller keeps the file)."""
    t = spark_type.lower()
    if t in ("byte", "short", "integer", "int", "long", "float", "double") or t.startswith("decimal"):
        if littype == "num":
            return (litval, "num")
        return None
    if t == "string":
        if littype == "str":
            return (litval, "str")
        return None
    if t == "date":
        if littype in ("str", "date"):
            try:
                return (_dt.date.fromisoformat(litval), "date")
            except ValueError:
                return None
        return None
    if t.startswith("timestamp"):
        if littype in ("str", "ts", "date"):
            try:
                v = _dt.datetime.fromisoformat(litval)
            except ValueError:
                return None
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return (v, "ts")
        return None
    if t == "boolean":
        if littype == "bool":
            return (litval, "bool")
        return None
    return None


def _stat_to_domain(v, domain: str):
    """Parse a stats-JSON bound back into the comparison domain."""
    if v is None:
        return None
    try:
        if domain == "num":
            return v if isinstance(v, (int, float)) else None
        if domain == "str":
            return v if isinstance(v, str) else None
        if domain == "date":
            return _dt.date.fromisoformat(v) if isinstance(v, str) else None
        if domain == "ts":
            if not isinstance(v, str):
                return None
            out = _dt.datetime.fromisoformat(v)
            if out.tzinfo is not None:
                out = out.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return out
        if domain == "bool":
            return v if isinstance(v, bool) else None
    except (ValueError, TypeError):
        return None
    return None


def _partition_to_domain(raw: str | None, domain: str):
    if raw is None:
        return None
    try:
        if domain == "num":
            return float(raw) if ("." in raw or "e" in raw or "E" in raw) else int(raw)
        if domain == "str":
            return raw
        if domain == "date":
            return _dt.date.fromisoformat(raw)
        if domain == "ts":
            return _dt.datetime.fromisoformat(raw)
        if domain == "bool":
            return raw.lower() == "true"
    except (ValueError, TypeError):
        return None
    return None


def _cmp_may_match(op: str, lit, lo, hi, *, max_exact: bool = True):
    """Interval test: can a value in [lo, hi] satisfy ``value op lit``?
    ``lo``/``hi`` may be None (unknown ⇒ unbounded on that side).
    ``max_exact=False`` means ``hi`` is only an upper bound, not an
    attained value (truncated string max) — equality can't be proven
    present, but that only matters for '!=' pruning, which requires
    exact bounds."""
    if op == "=":
        if lo is not None and lit < lo:
            return False
        if hi is not None and lit > hi:
            return False
        return True
    if op == "prefix":  # value LIKE 'lit%': value >= lit and value < lit+ε
        if hi is not None and hi < lit:
            return False
        if lo is not None and not (lo[: len(lit)] <= lit):
            return False
        return True
    if op == "!=":
        # only an all-equal file can be skipped, and only when both bounds
        # are exact attained values
        if lo is not None and hi is not None and max_exact and lo == hi == lit:
            return False
        return True
    if op == "<":
        return lo is None or lo < lit
    if op == "<=":
        return lo is None or lo <= lit
    if op == ">":
        return hi is None or hi > lit
    if op == ">=":
        return hi is None or hi >= lit
    return True


def compile_conjuncts(
    conjuncts,
    schema_types: dict[str, str],
    partition_cols: list[str],
    mapping: dict[str, str] | None = None,
):
    """Pre-resolve everything about a predicate that does not depend on
    the file being tested (guide §4.5 — init once per plan, not per
    file): schema lookups, physical-name mapping, literal coercion and
    op dispatch all happen ONCE here; the per-file evaluator then only
    parses that file's stats/partition values and compares. Conjuncts
    that can never refute a file (unknown column, non-coercible literal)
    compile away entirely. Decisions are identical to the historical
    inline evaluation by construction — each compiled form is the same
    branch the old per-file loop took."""
    compiled: list[tuple] = []
    for col, op, lit in conjuncts:
        spark_type = schema_types.get(col)
        if spark_type is None:
            continue  # unknown column (computed?) — no skipping
        phys = (mapping or {}).get(col, col)
        if col in partition_cols:
            if op == "isnull":
                compiled.append(("p_isnull", col, phys, None, None))
            elif op == "notnull":
                compiled.append(("p_notnull", col, phys, None, None))
            elif op == "in":
                vals = []
                noop = False
                for lt in lit:
                    c = _coerce(lt[0], lt[1], spark_type)
                    if c is None:
                        # a non-coercible literal keeps the file (the old
                        # loop broke out with ok=True) — conjunct is a no-op
                        noop = True
                        break
                    vals.append(c)
                if not noop:
                    compiled.append(("p_in", col, phys, vals, None))
            else:
                c = _coerce(lit[0], lit[1], spark_type) if lit else None
                if c is not None:
                    compiled.append(("p_cmp", col, phys, c[0], (op, c[1])))
        elif op == "isnull":
            compiled.append(("s_isnull", col, phys, None, None))
        elif op == "notnull":
            compiled.append(("s_notnull", col, phys, None, None))
        elif op == "in":
            coerced = []
            domain = None
            bail = False
            for lt in lit:
                c = _coerce(lt[0], lt[1], spark_type)
                if c is None:
                    bail = True
                    break
                coerced.append(c[0])
                domain = c[1]
            if not bail and coerced:
                compiled.append(("s_in", col, phys, coerced, domain))
        else:
            c0 = _coerce(lit[0], lit[1], spark_type) if lit else None
            if c0 is not None:
                compiled.append(("s_cmp", col, phys, c0[0], (op, c0[1])))
    return compiled


def _compiled_may_match(compiled, add: dict) -> bool:
    """Per-file half of the split evaluator: stats parsed once, then a
    direct dispatch over the pre-compiled conjuncts."""
    stats = None
    raw = add.get("stats")
    if raw:
        try:
            stats = json.loads(raw) if isinstance(raw, str) else raw
        except (ValueError, TypeError):
            stats = None
    pv = add.get("partitionValues") or {}
    for kind, col, phys, litv, extra in compiled:
        if kind[0] == "p":
            if col not in pv and phys not in pv:
                continue
            raw_pv = pv.get(col, pv.get(phys))
            if kind == "p_isnull":
                if raw_pv is not None:
                    return False
                continue
            if kind == "p_notnull":
                if raw_pv is None:
                    return False
                continue
            if raw_pv is None:
                return False  # NULL partition: no comparison matches
            if kind == "p_in":
                ok = False
                for v_lit, domain in litv:
                    v = _partition_to_domain(raw_pv, domain)
                    if v is None or v == v_lit:
                        ok = True
                        break
                if not ok:
                    return False
                continue
            # p_cmp
            op, domain = extra
            v = _partition_to_domain(raw_pv, domain)
            if v is None:
                continue
            if not _cmp_may_match(op, litv, v, v):
                return False
            continue
        # data column: consult file stats
        if stats is None:
            continue
        num = stats.get("numRecords")
        nulls = (stats.get("nullCount") or {}).get(phys)
        all_null = num is not None and nulls is not None and nulls == num and num > 0
        if kind == "s_isnull":
            if nulls == 0 and num is not None and num > 0:
                return False
            continue
        if kind == "s_notnull":
            if all_null:
                return False
            continue
        if all_null:
            return False  # every comparison against NULL fails
        if kind == "s_in":
            domain = extra
            lo = _stat_to_domain((stats.get("minValues") or {}).get(phys), domain)
            hi = _stat_to_domain((stats.get("maxValues") or {}).get(phys), domain)
            if lo is None and hi is None:
                continue
            if not any(_cmp_may_match("=", v, lo, hi) for v in litv):
                return False
            continue
        # s_cmp
        op, domain = extra
        lo = _stat_to_domain((stats.get("minValues") or {}).get(phys), domain)
        hi = _stat_to_domain((stats.get("maxValues") or {}).get(phys), domain)
        if lo is None and hi is None:
            continue
        # string maxima can be absent-by-truncation; '!=' pruning needs the
        # max to be an attained value, which a missing max never is
        if not _cmp_may_match(op, litv, lo, hi, max_exact=hi is not None):
            return False
    return True


def file_may_match(
    conjuncts,
    add: dict,
    schema_types: dict[str, str],
    partition_cols: list[str],
    mapping: dict[str, str] | None = None,
) -> bool:
    """Conservative per-file test: False only when stats/partition values
    PROVE no row in the file satisfies every conjunct. One-shot form of
    compile_conjuncts + _compiled_may_match — loops hoist the compile."""
    return _compiled_may_match(
        compile_conjuncts(conjuncts, schema_types, partition_cols, mapping),
        add,
    )


def _utc_session() -> bool:
    """True when the active Spark session's timezone is UTC (or there is
    no session to disagree). LTZ timestamp literals in a predicate are
    interpreted in the SESSION timezone, while stored stats bounds are
    UTC-rendered — comparing them is only sound when the two frames
    coincide."""
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is None:
            return False
        return s.conf.get("spark.sql.session.timeZone") in (
            "UTC",
            "Etc/UTC",
            "GMT",
            "Z",
            "+00:00",
        )
    except Exception:
        return False


def tz_safe_conjuncts(conjuncts, schema_types: dict[str, str]):
    """Drop conjuncts over session-timezone-DEPENDENT columns (LTZ
    ``timestamp``; ntz and date are wall-clock and safe) unless the
    session runs UTC — those comparisons would mix timezone frames and
    could wrongly prune live files. Fail-open by subtraction."""
    if _utc_session():
        return conjuncts
    return [
        c for c in conjuncts if schema_types.get(c[0], "") != "timestamp"
    ]


def _prepare_prune(meta: dict, where: str):
    """Shared eligibility prologue: returns (conjuncts, schema_types,
    part_cols, mapping), or None when the predicate/metadata shape
    disables skipping (callers keep every file — skipping NEVER
    guesses)."""
    conjuncts = parse_conjuncts(where)
    if not conjuncts:
        return None
    schema_types: dict[str, str] = {}
    try:
        schema = json.loads(meta["schemaString"])
        for f in schema.get("fields", []):
            if isinstance(f.get("type"), str):
                schema_types[f["name"]] = f["type"]
    except (KeyError, ValueError, TypeError):
        return None
    conjuncts = tz_safe_conjuncts(conjuncts, schema_types)
    if not conjuncts:
        return None
    part_cols = meta.get("partitionColumns") or []
    mapping = None
    try:
        cfg = meta.get("configuration") or {}
        if cfg.get("delta.columnMapping.mode") == "name":
            mapping = {
                f["name"]: f.get("metadata", {}).get(
                    "delta.columnMapping.physicalName", f["name"]
                )
                for f in schema.get("fields", [])
            }
    except (ValueError, TypeError, AttributeError):
        mapping = None
    return conjuncts, schema_types, part_cols, mapping


def prune_adds(
    adds: dict[str, dict],
    meta: dict,
    where: str,
) -> tuple[dict[str, dict], int]:
    """Prune a snapshot's ``{relpath: add}`` map with a predicate string.
    Returns (kept_adds, skipped_count). Ineligible predicates return the
    input untouched — skipping NEVER guesses."""
    prep = _prepare_prune(meta, where)
    if prep is None:
        return adds, 0
    conjuncts, schema_types, part_cols, mapping = prep
    compiled = compile_conjuncts(conjuncts, schema_types, part_cols, mapping)
    kept = {
        rel: a
        for rel, a in adds.items()
        if _compiled_may_match(compiled, a)
    }
    return kept, len(adds) - len(kept)


#: above this file count, prune_adds_auto evaluates the per-file checks as
#: a Spark job instead of a single-threaded driver loop. MEASURED on this
#: harness (local[32]): the driver loop evaluates ~200k files/s, while the
#: job pays ~1 s of launch+Arrow overhead before its 32-way speedup bites —
#: crossover lands around 2×10^5 files; a 10^6-file snapshot (the 100 TB
#: case) plans ~3× faster distributed. Same threshold class as Spark's
#: parallel file listing (parallelPartitionDiscovery.threshold).
DISTRIBUTED_PRUNE_THRESHOLD = 200_000


def prune_adds_distributed(
    spark,
    adds: dict[str, dict],
    meta: dict,
    where: str,
) -> tuple[dict[str, dict], int]:
    """Same decisions as ``prune_adds``, evaluated as a DataFrame job:
    the (relpath, add-JSON) rows are distributed and each partition runs
    the identical ``file_may_match`` evaluator (Arrow-batched
    mapInPandas), so a 10^6-file snapshot plans in parallel instead of
    serially on the driver. The driver still holds the add map — that is
    the log-replay contract every table-format planner shares — but the
    O(#files × #conjuncts) evaluation no longer runs single-threaded.
    Property-tested for agreement with the driver path
    (tests/test_skipping_properties.py)."""
    prep = _prepare_prune(meta, where)
    if prep is None:
        return adds, 0
    conjuncts, schema_types, part_cols, mapping = prep

    compiled = compile_conjuncts(conjuncts, schema_types, part_cols, mapping)

    def _eval(batches):
        import pandas as pd

        for pdf in batches:
            keep = [
                _compiled_may_match(
                    compiled,
                    {
                        "stats": st,
                        "partitionValues": json.loads(pv) if pv else {},
                    },
                )
                for st, pv in zip(pdf["stats"], pdf["pv_json"])
            ]
            yield pd.DataFrame({"rel": pdf["rel"][keep]})

    import pandas as pd

    # ship only the two add fields the evaluator reads (stats is ALREADY a
    # JSON string in the add action — re-encoding the whole add would pay
    # an O(len(stats)) re-escape per file on the driver; guide §2.3,
    # project before the exchange)
    pdf = pd.DataFrame(
        {
            "rel": list(adds.keys()),
            "stats": [
                a.get("stats") if isinstance(a.get("stats"), str)
                else (json.dumps(a["stats"]) if a.get("stats") else None)
                for a in adds.values()
            ],
            "pv_json": [
                json.dumps(pv) if (pv := a.get("partitionValues")) else None
                for a in adds.values()
            ],
        }
    )
    df = spark.createDataFrame(pdf)  # Arrow-batched when enabled
    kept_rels = {
        r["rel"] for r in df.mapInPandas(_eval, "rel string").collect()
    }
    kept = {rel: a for rel, a in adds.items() if rel in kept_rels}
    return kept, len(adds) - len(kept)


def prune_adds_auto(
    spark,
    adds: dict[str, dict],
    meta: dict,
    where: str,
    threshold: int | None = None,
) -> tuple[dict[str, dict], int]:
    """Dispatch: driver loop below ``threshold`` files (job-launch
    overhead dominates), Spark job above it."""
    limit = DISTRIBUTED_PRUNE_THRESHOLD if threshold is None else threshold
    if spark is not None and len(adds) > limit:
        return prune_adds_distributed(spark, adds, meta, where)
    return prune_adds(adds, meta, where)
