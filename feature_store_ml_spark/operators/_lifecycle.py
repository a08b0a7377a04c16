"""Lifecycle management for cached intermediates.

Several operators (minhash_lsh_pairs, simhash_pairs, lsh_topk,
embedding_dups, ivf_topk, connected_components) cache an intermediate stage
as a deliberate optimization barrier — without it CollapseProject re-inlines
the expensive signature expression into every downstream reference (16-64×
recomputation; see the per-operator docstrings). A bare ``.cache()`` leaks:
in a long-lived session repeated calls accumulate blocks in executor memory
forever, because nothing ever unpersists them.

``autorelease(out, *cached)`` ties the cached stages to the RETURNED
DataFrame:

- explicit: ``release(out)`` unpersists them now (call it after the result
  is materialized);
- automatic: a ``weakref.finalize`` on the result unpersists them when the
  result is garbage-collected, so sessions that drop the result reclaim the
  memory without cooperation.

Unpersisting only removes cache entries — any still-live derived plan simply
recomputes, so correctness is never at stake, only the barrier's perf.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_HANDLE = "_cached_intermediates"


def _unpersist_all(refs: list[DataFrame]) -> None:
    for df in refs:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped / JVM gone — nothing to release


def autorelease(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach cached intermediates to ``out`` for explicit ``release`` and
    unpersist them automatically when ``out`` is garbage-collected."""
    refs = list(cached)
    setattr(out, _HANDLE, refs)
    weakref.finalize(out, _unpersist_all, refs)
    return out


def release(out: DataFrame) -> None:
    """Unpersist the cached intermediates attached to an operator result
    (no-op for DataFrames without any)."""
    _unpersist_all(getattr(out, _HANDLE, []))
