"""Batch event analytics (sessionize, value_percentiles) vs Python oracles."""

from __future__ import annotations

import datetime as dt

import numpy as np


def _mk_events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions (gap 7 min), incl. an exactly-5-min boundary pair
    for m in (0, 2, 4):
        rows.append((1, base + dt.timedelta(minutes=m), "click", float(m)))
    rows.append((1, base + dt.timedelta(minutes=11), "click", 11.0))
    rows.append((1, base + dt.timedelta(minutes=16), "view", 16.0))  # exactly at 11+gap
    # user 2: single long session
    for m in (0, 4, 8, 12):
        rows.append((2, base + dt.timedelta(minutes=m), "view", float(m)))
    return spark.createDataFrame(
        [(i, ts, u, et, v) for i, (u, ts, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_sessionize_matches_gap_oracle(spark):
    from sparkgraph.events import sessionize

    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(_mk_events(spark), gap="5 minutes").collect()
    )
    base = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(minutes=5)
    want = sorted(
        [
            # user 1 session A: 0,2,4 min
            (1, base, base + dt.timedelta(minutes=4) + gap, 3),
            # boundary: an event EXACTLY at last_ts + gap still EXTENDS the
            # session (Spark session_window is inclusive at the boundary)
            (1, base + dt.timedelta(minutes=11), base + dt.timedelta(minutes=16) + gap, 2),
            (2, base, base + dt.timedelta(minutes=12) + gap, 4),
        ]
    )
    assert got == want


def test_value_percentiles_match_numpy(spark):
    from sparkgraph.events import value_percentiles

    df = _mk_events(spark)
    got = {
        r.event_type: (r.n_events, r.p50, r.p90, r.p99)
        for r in value_percentiles(df).collect()
    }
    rows = df.collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vals in by_type.items():
        v = np.array(sorted(vals))
        want = tuple(
            round(float(np.quantile(v, p, method="linear")), 6)
            for p in (0.5, 0.9, 0.99)
        )
        assert got[et][0] == len(vals)
        assert got[et][1:] == want, et
