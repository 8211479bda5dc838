"""Sessionized path mining (plans/events_queries.q_event_paths r9):
gap-boundary semantics and path ordering."""

from __future__ import annotations

import datetime as dt

from big_data_assignment_2_spark.plans.events_queries import q_event_paths


def _write_events(spark, rows, path):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
              " event_type string, value double, props string") \
        .write.parquet(f"{path}/events.parquet")


def test_gap_boundary_and_ordering(spark, tmp_path):
    """Events exactly 30 min apart stay in ONE session (strict > gap);
    30 min + 1 us splits.  Paths preserve (ts, event_id) order."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m30 = dt.timedelta(minutes=30)
    rows = [
        # user 1: a -> b exactly 30 min later (same session),
        # then c at +30min+1s from b (new session)
        (1, t0, 1, "a", 0.0, ""),
        (2, t0 + m30, 1, "b", 0.0, ""),
        (3, t0 + m30 + m30 + dt.timedelta(seconds=1), 1, "c", 0.0, ""),
        # user 2: same-timestamp tie broken by event_id: d(4) then e(5)
        (5, t0, 2, "e", 0.0, ""),
        (4, t0, 2, "d", 0.0, ""),
    ]
    _write_events(spark, rows, str(tmp_path))
    got = {r["path"]: (r["n_sessions"], r["n_users"])
           for r in q_event_paths(spark, str(tmp_path)).collect()}
    assert got == {"a>b": (1, 1), "c": (1, 1), "d>e": (1, 1)}


def test_path_counts_aggregate_across_users(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(4):
        for i, et in enumerate(["x", "y"]):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(seconds=i), uid,
                         et, 0.0, ""))
    _write_events(spark, rows, str(tmp_path))
    got = {r["path"]: (r["n_sessions"], r["n_users"])
           for r in q_event_paths(spark, str(tmp_path)).collect()}
    assert got == {"x>y": (4, 4)}


def test_transitions_counts_and_shares(spark, tmp_path):
    """x->y twice and x->z once from sessions: shares 2/3 and 1/3;
    cross-session adjacency must NOT create a transition."""
    import datetime as dt

    from big_data_assignment_2_spark.plans.events_queries import \
        q_event_transitions

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=2)
    rows = [
        (1, t0, 1, "x", 0.0, ""), (2, t0 + dt.timedelta(seconds=1), 1, "y", 0.0, ""),
        (3, t0 + h, 1, "x", 0.0, ""), (4, t0 + h + dt.timedelta(seconds=1), 1, "y", 0.0, ""),
        (5, t0, 2, "x", 0.0, ""), (6, t0 + dt.timedelta(seconds=1), 2, "z", 0.0, ""),
        # session boundary between events 7 and 8: no y->x transition
        (7, t0 + 2 * h, 2, "y", 0.0, ""), (8, t0 + 4 * h, 2, "x", 0.0, ""),
    ]
    _write_events(spark, rows, str(tmp_path))
    got = {(r["from_event"], r["to_event"]): (r["n"], r["share"])
           for r in q_event_transitions(spark, str(tmp_path)).collect()}
    assert got == {("x", "y"): (2, round(2 / 3, 6)),
                   ("x", "z"): (1, round(1 / 3, 6))}
