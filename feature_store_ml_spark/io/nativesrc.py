"""Once-per-application memo of native DataSource availability.

``spark.read.format("iceberg").load(...)`` on a classpath without the
runtime jar fails at PLAN time with DATA_SOURCE_NOT_FOUND — but each
such failure costs a full JVM exception round trip: the JVM builds the
exception + stack trace, py4j stringifies it, and pyspark's
``convert_exception`` walks the cause chain with further py4j calls
(measured 0.15-0.4 s per failed ``load``). The fallback readers/writers
used to pay that on EVERY call.

The classpath cannot change inside a running application, so the
absent classification is memoized per ``(applicationId, source name)``:
only the first attempt pays the probe, every later call skips straight
to the pure-python path. When the jar IS present nothing is memoized
and the native path keeps being used unconditionally.
"""

from __future__ import annotations

_ABSENT: set[tuple[str, str]] = set()


def _app_id(spark) -> str:
    """applicationId with a per-session memo: the property itself costs
    py4j round trips, and the memo is read on every lakehouse call."""
    aid = getattr(spark, "_fsml_app_id", None)
    if aid is None:
        aid = spark.sparkContext.applicationId
        try:
            spark._fsml_app_id = aid
        except Exception:
            pass
    return aid


def known_absent(spark, name: str) -> bool:
    """True when this application already proved ``format(name)`` has no
    registered DataSource (so the caller can skip the doomed attempt)."""
    return (_app_id(spark), name) in _ABSENT


def mark_absent(spark, name: str) -> None:
    """Record a DATA_SOURCE_NOT_FOUND classification for this application."""
    _ABSENT.add((_app_id(spark), name))


def is_source_not_found(exc: BaseException) -> bool:
    """PRECISE missing-DataSource classification — the only one callers
    may memoize. The per-call fallback match is deliberately broader
    ('Failed to find' anywhere in the message), but memoizing on that
    would let one unrelated error whose text happens to contain the
    fragment permanently disable the native path for the whole
    application (and the pure-python fallback caps at reader feature
    levels the native jar may exceed)."""
    try:
        from pyspark.errors import AnalysisException

        if isinstance(exc, AnalysisException):
            try:
                cond = exc.getCondition()
            except Exception:
                cond = getattr(exc, "errorClass", None)
            if cond == "DATA_SOURCE_NOT_FOUND":
                return True
    except ImportError:
        pass
    return "Failed to find the data source" in str(exc)
