"""Model-based check of the sessionizer kernel (no Spark needed).

``_fold_segments`` + ``_split_safe`` drive ``timeout_sessions``; here
hypothesis replays random event streams through a faithful simulation
of Spark's micro-batch admission (rows below the watermark are
dropped, the watermark is max-event-time-so-far minus delay, timers
fire when the watermark passes a deadline) and requires the emitted
plus pending sessions to equal gap-sessionization of exactly the
admitted rows. This covers out-of-order arrivals, bridging events,
multi-session batches, and replay granularities that the
Spark-process tests can only spot-check.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flycatcher_spark.streaming.tws import _fold_segments, _split_safe

GAP_MS = 1000


def _reference_sessions(ts_list):
    """Gap sessionization of a multiset of timestamps."""
    if not ts_list:
        return []
    ts = sorted(ts_list)
    out = []
    start = last = ts[0]
    n = 1
    for t in ts[1:]:
        if t - last > GAP_MS:
            out.append((start, last, n))
            start, n = t, 0
        last = t
        n += 1
    out.append((start, last, n))
    return out


def _simulate(batches, delay_ms):
    """Spark-faithful replay: per batch, drop rows below the current
    watermark, fold into pending state, emit watermark-sealed
    segments; advance the watermark at batch end; fire 'timers' by
    re-splitting pending whenever the watermark moves."""
    wm = -(10**18)  # no watermark yet
    pending = []
    emitted = []
    admitted = []
    for batch in batches:
        rows = [t for t in batch if t >= wm]
        admitted.extend(rows)
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(rows, unit="ms"), "v": [1.0] * len(rows)}
        )
        segs = _fold_segments([pdf], "ts", "v", GAP_MS, pending)
        safe, pending = _split_safe(segs, GAP_MS, wm)
        emitted.extend(safe)
        if batch:
            wm = max(wm, max(batch) - delay_ms)
        # timer pass at the new watermark
        safe, pending = _split_safe(pending, GAP_MS, wm)
        emitted.extend(safe)
    return emitted, pending, admitted


@settings(max_examples=300, deadline=None)
@given(
    batches=st.lists(
        st.lists(st.integers(min_value=0, max_value=20_000), max_size=8),
        max_size=6,
    ),
    delay_ms=st.sampled_from([0, 10, 500, 2000]),
)
def test_emitted_plus_pending_equals_reference(batches, delay_ms):
    emitted, pending, admitted = _simulate(batches, delay_ms)
    got = sorted((s[0], s[1], s[2]) for s in emitted + pending)
    want = sorted(_reference_sessions(admitted))
    assert got == want


@settings(max_examples=300, deadline=None)
@given(
    batches=st.lists(
        st.lists(st.integers(min_value=0, max_value=20_000), max_size=8),
        max_size=6,
    ),
    delay_ms=st.sampled_from([0, 10, 500, 2000]),
)
def test_emitted_sessions_are_final(batches, delay_ms):
    """Nothing already emitted may still be extendable: every emitted
    segment's deadline sits strictly below the watermark that sealed
    it, so no admissible later event can merge into it."""
    wm = -(10**18)
    pending = []
    for batch in batches:
        rows = [t for t in batch if t >= wm]
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(rows, unit="ms"), "v": [1.0] * len(rows)}
        )
        segs = _fold_segments([pdf], "ts", "v", GAP_MS, pending)
        safe, pending = _split_safe(segs, GAP_MS, wm)
        for s in safe:
            assert s[1] + GAP_MS < wm
        if batch:
            wm = max(wm, max(batch) - delay_ms)
        safe, pending = _split_safe(pending, GAP_MS, wm)
        for s in safe:
            assert s[1] + GAP_MS < wm
