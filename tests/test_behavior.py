"""Hand-computed checks for operators/behavior.py (ordered funnel, weekly
retention cohorts)."""

from __future__ import annotations

from datetime import datetime

from realtime_market_data_pipeline_spark.operators.behavior import (
    funnel,
    retention_cohorts,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_requires_stage_order(spark):
    ev = _events(
        spark,
        [
            # u1 converts fully in order
            (1, 1, 9, "view"),
            (1, 1, 10, "click"),
            (1, 1, 11, "purchase"),
            # u2: purchase BEFORE any click -> stops at stage 2
            (2, 1, 9, "view"),
            (2, 1, 10, "purchase"),
            (2, 1, 11, "click"),
            # u3: click before view -> that click must not count; a later
            # click does
            (3, 1, 8, "click"),
            (3, 1, 9, "view"),
            (3, 1, 12, "click"),
            # u4: never views -> enters no stage
            (4, 1, 9, "click"),
            (4, 1, 10, "purchase"),
        ],
    )
    r = funnel(ev).collect()[0]
    assert (r.n_stage1, r.n_stage2, r.n_stage3) == (3, 3, 1)
    assert r.conv_1_2 == 1.0
    assert r.conv_overall == round(1 / 3, 6)


def test_funnel_equal_timestamps_count(spark):
    # ts >= t_prev: a click at exactly the first-view instant converts
    ev = _events(spark, [(1, 1, 9, "view"), (1, 1, 9, "click")])
    r = funnel(ev).collect()[0]
    assert (r.n_stage1, r.n_stage2, r.n_stage3) == (1, 1, 0)


def test_retention_cohorts_by_hand(spark):
    # 2024-01-01 is a Monday: days 1-7 week A, 8-14 week B
    ev = _events(
        spark,
        [
            # u1, u2 first seen week A; u1 returns week B
            (1, 2, 9, "view"),
            (1, 9, 9, "view"),
            (2, 3, 9, "view"),
            # u3 first seen week B
            (3, 10, 9, "view"),
        ],
    )
    out = {
        (r.cohort_week.day, r.active_week.day): r
        for r in retention_cohorts(ev).collect()
    }
    a, b = 1, 8  # Monday day-of-month of each week
    assert out[(a, a)].n_active == 2 and out[(a, a)].cohort_size == 2
    assert out[(a, a)].week_offset == 0 and out[(a, a)].retention == 1.0
    assert out[(a, b)].n_active == 1 and out[(a, b)].retention == 0.5
    assert out[(a, b)].week_offset == 1
    assert out[(b, b)].n_active == 1 and out[(b, b)].cohort_size == 1
    # no row may precede its cohort
    assert all(k[1] >= k[0] for k in out)


def test_event_transitions_by_hand(spark):
    from realtime_market_data_pipeline_spark.operators.behavior import (
        event_transitions,
    )

    rows = [
        # u1: view -> click -> view ; u2: view -> click
        (1, 1, datetime(2024, 1, 1, 9), "view"),
        (2, 1, datetime(2024, 1, 1, 10), "click"),
        (3, 1, datetime(2024, 1, 1, 11), "view"),
        (4, 2, datetime(2024, 1, 1, 9), "view"),
        (5, 2, datetime(2024, 1, 1, 10), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {(r.from_type, r.to_type): r for r in event_transitions(ev).collect()}
    assert out[("view", "click")].n == 2
    assert out[("view", "click")].prob == 1.0
    assert out[("click", "view")].n == 1
    assert out[("click", "view")].prob == 1.0
    assert set(out) == {("view", "click"), ("click", "view")}


def test_event_transitions_tiebreak_by_event_id(spark):
    from realtime_market_data_pipeline_spark.operators.behavior import (
        event_transitions,
    )

    t = datetime(2024, 1, 1, 9)
    ev = spark.createDataFrame(
        [(1, 1, t, "view"), (2, 1, t, "click"), (3, 1, t, "purchase")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {(r.from_type, r.to_type) for r in event_transitions(ev).collect()}
    # equal timestamps order by event_id: view->click->purchase
    assert out == {("view", "click"), ("click", "purchase")}


def test_funnel_conversion_times_by_hand(spark):
    from realtime_market_data_pipeline_spark.operators.behavior import (
        funnel_conversion_times,
    )

    ev = _events(
        spark,
        [
            (1, 1, 9, "view"), (1, 1, 10, "click"), (1, 1, 12, "purchase"),
            (2, 1, 9, "view"), (2, 1, 11, "click"),
            (3, 1, 9, "view"),
        ],
    )
    r = funnel_conversion_times(ev).collect()[0]
    h = 3_600_000
    assert (r.n_converted_2, r.n_converted_3) == (2, 1)
    assert r.avg_ms_1_2 == (1 * h + 2 * h) / 2
    assert r.median_ms_1_2 == 1.5 * h
    assert r.avg_ms_1_3 == 3 * h and r.median_ms_1_3 == 3 * h


def test_sequence_pattern_match_by_hand(spark):
    """Hand-built histories: u1 v->c->p (funnel), u2 s->v (signup-first),
    u3 p->e->p (repeat purchase WITH error between — must NOT match the
    no-error variant), u4 p->v->p (matches it)."""
    from datetime import datetime

    from realtime_market_data_pipeline_spark.operators.behavior import (
        sequence_pattern_match,
    )

    rows, eid = [], 0
    hist = {
        1: ["view", "click", "purchase"],
        2: ["signup", "view"],
        3: ["purchase", "error", "purchase"],
        4: ["purchase", "view", "purchase"],
    }
    for u, types in hist.items():
        for i, t in enumerate(types):
            rows.append((eid, u, t, datetime(2026, 1, 1, 0, i)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {
        r.pattern: r
        for r in sequence_pattern_match(
            df,
            patterns={
                "funnel_vcp": "v.*c.*p",
                "signup_first": "^s",
                "any_error": "e",
                "repeat_purchase_no_error": "p[^e]*p",
            },
        ).collect()
    }
    assert all(r.n_total_users == 4 for r in out.values())
    assert out["funnel_vcp"].n_users == 1
    assert out["signup_first"].n_users == 1
    assert out["any_error"].n_users == 1
    assert out["repeat_purchase_no_error"].n_users == 1  # u4 only, not u3
    assert out["funnel_vcp"].frac == 0.25


def test_sequence_pattern_match_orders_by_ts_then_event_id(spark):
    """Two events share a timestamp: event_id must break the tie, so u1's
    sequence is 'vp' (view first), matching 'v.*p'."""
    from datetime import datetime

    from realtime_market_data_pipeline_spark.operators.behavior import (
        sequence_pattern_match,
    )

    t = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, "view", t), (2, 1, "purchase", t)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {
        r.pattern: r
        for r in sequence_pattern_match(df, patterns={"vp": "^vp$"}).collect()
    }
    assert out["vp"].n_users == 1


def test_sequence_pattern_match_escapes_quoted_keys(spark):
    """Caller-supplied pattern names land inside an F.expr stack() string;
    quotes/backslashes in a key must round-trip, not break the SQL."""
    from datetime import datetime

    from realtime_market_data_pipeline_spark.operators.behavior import (
        sequence_pattern_match,
    )

    df = spark.createDataFrame(
        [(0, 1, "view", datetime(2026, 1, 1)), (1, 1, "purchase", datetime(2026, 1, 1, 1))],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = {
        r.pattern: r.n_users
        for r in sequence_pattern_match(
            df, patterns={"view'n'buy": "v.*p", "back\\slash": "^x"}
        ).collect()
    }
    assert out == {"view'n'buy": 1, "back\\slash": 0}
