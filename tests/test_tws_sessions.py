"""transformWithState sessionization: the pure session algebra is tested
exhaustively here (no streaming runtime needed); the full operator is
protobuf-gated in this image (see streaming/events.py::tws_available) and
runs end-to-end wherever google.protobuf is installed."""

import numpy as np
import pytest

from feature_store_ml_spark.streaming.events import (
    merge_session_batch,
    tws_available,
    tws_user_sessions,
)

GAP_US = 30 * 60 * 1_000_000  # 30 min


def _batch_oracle(ts_us, vals, gap_us=GAP_US):
    """Reference sessionization of a complete, sorted event list."""
    sessions = []
    start = last = ts_us[0]
    n, vsum = 1, float(vals[0])
    for t, v in zip(ts_us[1:], vals[1:]):
        if t - last > gap_us:
            sessions.append((start, last, n, vsum))
            start, n, vsum = t, 0, 0.0
        last = t
        n += 1
        vsum += float(v)
    sessions.append((start, last, n, vsum))
    return sessions


def test_merge_splits_on_gap():
    m = 60_000_000  # 1 min in µs
    ts = np.array([0, 5 * m, 120 * m, 125 * m, 300 * m])
    vals = np.ones(5)
    closed, open_now = merge_session_batch(ts, vals, None, GAP_US)
    assert closed == [(0, 5 * m, 2, 2.0), (120 * m, 125 * m, 2, 2.0)]
    assert open_now == (300 * m, 300 * m, 1, 1.0)


def test_merge_extends_open_state():
    m = 60_000_000
    closed, open_now = merge_session_batch(
        np.array([10 * m, 20 * m]), np.ones(2), (0, 5 * m, 3, 7.5), GAP_US
    )
    assert closed == []
    assert open_now == (0, 20 * m, 5, 9.5)


def test_merge_closes_open_state_on_gap():
    m = 60_000_000
    closed, open_now = merge_session_batch(
        np.array([100 * m]), np.ones(1), (0, 5 * m, 3, 7.5), GAP_US
    )
    assert closed == [(0, 5 * m, 3, 7.5)]
    assert open_now == (100 * m, 100 * m, 1, 1.0)


def test_chunked_replay_equals_batch_sessionization():
    """Feeding the same event list through merge_session_batch in arbitrary
    chunk sizes must emit exactly the batch sessions (closed + final open) —
    the invariant the streaming operator relies on across micro-batches."""
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        gaps = rng.choice(
            [30_000_000, 10 * 60_000_000, 45 * 60_000_000], size=n
        )  # 30s / 10min / 45min inter-arrivals
        ts = np.cumsum(gaps)
        vals = rng.normal(size=n)
        expected = _batch_oracle(ts, vals)

        emitted, state = [], None
        i = 0
        while i < n:
            k = int(rng.integers(1, 50))
            closed, state = merge_session_batch(
                ts[i : i + k], vals[i : i + k], state, GAP_US
            )
            emitted.extend(closed)
            i += k
        emitted.append(state)  # the timer would flush the final open session
        assert len(emitted) == len(expected)
        for (es, el, en, ev), (xs, xl, xn, xv) in zip(emitted, expected):
            assert (es, el, en) == (xs, xl, xn)
            assert abs(ev - xv) < 1e-9


@pytest.mark.skipif(
    tws_available(), reason="protobuf present: covered by the end-to-end test"
)
def test_tws_gated_without_protobuf(spark):
    with pytest.raises(RuntimeError, match="protobuf"):
        tws_user_sessions(spark, "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not tws_available(), reason="google.protobuf not installed in this image"
)
def test_tws_sessions_end_to_end(spark):
    """Full operator parity where protobuf exists: every emitted session
    matches the batch oracle's non-final sessions plus timer-expired
    finals (see tws_user_sessions docstring for the exact contract)."""
    out = tws_user_sessions(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert list(out.columns) == [
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    ]
