"""Hand-computed checks for operators/quality.py profiling additions."""

from __future__ import annotations

from realtime_market_data_pipeline_spark.operators.quality import value_histogram


def _hist(spark, rows, nbins):
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = value_histogram(df, value_col="value", by="event_type", nbins=nbins)
    return {(r.event_type, r.bin): r for r in out.collect()}


def test_histogram_by_hand_with_max_clamp(spark):
    # X: values 0..10, 5 bins of width 2 -> bins 0..4; the max (10.0) must
    # land in the TOP bin (clamped), not in a phantom bin 5.
    rows = [("X", float(v)) for v in range(11)]
    h = _hist(spark, rows, nbins=5)
    assert {k[1] for k in h} == {0, 1, 2, 3, 4}
    assert h[("X", 0)].n_rows == 2  # 0, 1
    assert h[("X", 4)].n_rows == 3  # 8, 9, 10 (10 clamped into bin 4)
    assert h[("X", 0)].bin_lo == 0.0 and h[("X", 0)].bin_hi == 2.0
    assert h[("X", 4)].bin_lo == 8.0 and h[("X", 4)].bin_hi == 10.0


def test_histogram_constant_group_no_div_by_zero(spark):
    rows = [("C", 7.5), ("C", 7.5), ("C", 7.5)]
    h = _hist(spark, rows, nbins=20)
    assert list(h) == [("C", 0)]
    r = h[("C", 0)]
    assert r.n_rows == 3 and r.bin_lo == 7.5 and r.bin_hi == 7.5


def test_histogram_null_values_dropped_and_groups_independent(spark):
    df = spark.createDataFrame(
        [("A", 0.0), ("A", 4.0), ("A", None), ("B", -2.0), ("B", 2.0)],
        "event_type string, value double",
    )
    out = value_histogram(df, value_col="value", by="event_type", nbins=2)
    h = {(r.event_type, r.bin): r for r in out.collect()}
    assert sum(r.n_rows for k, r in h.items() if k[0] == "A") == 2
    # B spans [-2, 2]: -2 -> bin 0, 2 -> clamped into bin 1
    assert h[("B", 0)].n_rows == 1 and h[("B", 1)].n_rows == 1
    assert h[("B", 0)].bin_lo == -2.0 and h[("B", 1)].bin_hi == 2.0


def test_weighted_sample_pps_membership_rules(spark):
    from realtime_market_data_pipeline_spark.operators.text import (
        sample_key48,
        weighted_sample_pps,
    )
    # 200 unit-weight docs, one zero-weight doc, one whale holding half the
    # total weight (w=200 > tot/n_target) -> whale always kept, zero never.
    rows = [(i, 1) for i in range(200)] + [(900, 0), (901, 200)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    kept = weighted_sample_pps(df, "w", n_target=20, id_col="doc_id").collect()
    ids = {r.doc_id for r in kept}
    assert 901 in ids and 900 not in ids
    whale = next(r for r in kept if r.doc_id == 901)
    assert whale.p_inclusion == 1.0  # capped by least(1, .)
    # unit docs keep with p = 20/400 = 0.05 -> expect ~10; md5 keys are
    # fixed, so this is a deterministic count, just sanity-band it
    n_unit = len(ids) - 1
    assert 2 <= n_unit <= 30
    for r in kept:
        if r.doc_id < 200:
            assert r.p_inclusion == 0.05

    # determinism: same frame, different partitioning -> identical sample
    kept2 = {
        r.doc_id
        for r in weighted_sample_pps(
            df.repartition(7, "doc_id"), "w", n_target=20, id_col="doc_id"
        ).collect()
    }
    assert kept2 == ids

    # membership replays the documented inequality exactly
    keys = {
        r.doc_id: r.k
        for r in df.select("doc_id", sample_key48("doc_id").alias("k")).collect()
    }
    tot = 400
    expect = {
        i for i, w in rows if keys[i] * tot < 20 * w * (1 << 48)
    }
    assert ids == expect


def test_kmv_jaccard_pairs_exact_and_zero_overlap(spark):
    from realtime_market_data_pipeline_spark.operators.sketches import (
        kmv_jaccard_pairs,
    )

    # A and B share half their users; C is disjoint from both. k=64 > all
    # set sizes, so the "estimate" degenerates to the exact Jaccard.
    rows = (
        [("A", u) for u in range(40)]
        + [("B", u) for u in range(20, 60)]
        + [("C", u) for u in range(1000, 1020)]
    )
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    out = {(r.type_a, r.type_b): r for r in kmv_jaccard_pairs(df, k=64).collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab.jaccard_exact == round(20 / 60, 6)
    assert ab.jaccard_est == ab.jaccard_exact  # sketch holds the full sets
    assert ab.within_bound
    # zero-overlap pairs survive with jaccard 0, not a dropped row
    for k2 in (("A", "C"), ("B", "C")):
        assert out[k2].jaccard_exact == 0.0 and out[k2].jaccard_est == 0.0
        assert out[k2].within_bound


def test_value_drift_psi_by_hand(spark):
    import math
    from datetime import datetime

    from realtime_market_data_pipeline_spark.operators.quality import (
        value_drift_psi,
    )

    early, late = datetime(2026, 1, 1, 0), datetime(2026, 1, 1, 10)
    rows = [("X", float(v), early) for v in (0, 1, 2, 3)] + [
        ("X", float(v), late) for v in (0, 1)
    ]
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    (r,) = value_drift_psi(df, nbins=2).collect()
    # ref bins over [0,3], width 1.5: ref [2,2]; cur values 0,1 both bin 0
    assert (r.ref_n, r.cur_n) == (4, 2)
    assert (r.n_bins_used, r.n_bins_skipped) == (1, 1)
    expected = round(round((1.0 - 0.5) * math.log(1.0 / 0.5), 9), 6)
    assert r.psi == expected


def test_value_drift_psi_identical_halves_is_zero(spark):
    from datetime import datetime

    from realtime_market_data_pipeline_spark.operators.quality import (
        value_drift_psi,
    )

    early, late = datetime(2026, 1, 1, 0), datetime(2026, 1, 1, 10)
    rows = [("X", float(v), t) for t in (early, late) for v in range(10)]
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    (r,) = value_drift_psi(df, nbins=5).collect()
    assert r.psi == 0.0 and r.n_bins_skipped == 0


def test_seasonal_backtest_by_hand(spark, tmp_path):
    """Train half: hour-0 mean 10, hour-1 mean 20. Test half: hour-0 value
    13 (err +3), hour-1 value 14 (err -6) -> MAE 4.5, bias -1.5."""
    from datetime import datetime

    from realtime_market_data_pipeline_spark import queries as Q

    rows = [
        (1, datetime(2026, 1, 1, 0, 0), 7, "view", 8.0, "{}"),
        (2, datetime(2026, 1, 1, 0, 30), 7, "view", 12.0, "{}"),
        (3, datetime(2026, 1, 1, 1, 0), 7, "view", 20.0, "{}"),
        (4, datetime(2026, 1, 3, 0, 0), 7, "view", 13.0, "{}"),
        (5, datetime(2026, 1, 3, 1, 0), 7, "view", 14.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf_toy")
    import os

    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.event_type: r for r in Q.QUERIES["seasonal_baseline_backtest"](spark, d).collect()}
    r = out["view"]
    # midpoint of [Jan1 00:00, Jan3 01:00] = Jan2 00:30 -> train rows 1-3
    assert r.n_test_scored == 2
    assert r.mae == 4.5 and r.bias == -1.5
    assert r.avg_train_rows == 1  # (2 + 1) // 2 train rows per scored point


def test_inverted_index_postings_by_hand(spark, tmp_path):
    """'the' appears in 3 docs (df top), 'cat' in 2; postings rank by
    tf desc then doc_id — doc 2 ('the the the') leads 'the'."""
    import os

    from realtime_market_data_pipeline_spark import queries as Q

    rows = [
        (1, "the cat sat", "en", "s", 11),
        (2, "the the the", "en", "s", 11),
        (3, "the cat", "en", "s", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf_toy2")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = Q.QUERIES["inverted_index_postings"](spark, d).collect()
    the = sorted(
        [(r.rk, r.doc_id, r.tf) for r in out if r.term == "the"]
    )
    assert the == [(1, 2, 3), (2, 1, 1), (3, 3, 1)]
    assert all(r.df_docs == 3 for r in out if r.term == "the")
    cat = sorted([(r.rk, r.doc_id, r.tf) for r in out if r.term == "cat"])
    assert cat == [(1, 1, 1), (2, 3, 1)]


def test_zscore_outliers_exact_membership(spark, tmp_path):
    """49 values at 0, one at 100: the spike is the only >4-sigma row
    (z = sqrt(49) = 7 by the population formula); a constant-valued type
    (nvar = 0) must emit nothing rather than divide by zero."""
    import os
    from datetime import datetime

    from realtime_market_data_pipeline_spark import queries as Q

    t = datetime(2026, 1, 1)
    rows = [(i, t, 1, "view", 0.0, "{}") for i in range(49)] + [
        (99, t, 1, "view", 100.0, "{}")
    ] + [(200 + i, t, 1, "click", 5.0, "{}") for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf_toy3")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = Q.QUERIES["zscore_outlier_events"](spark, d).collect()
    assert [(r.event_id, r.event_type) for r in out] == [(99, "view")]
    assert out[0].z == 7.0


def test_weighted_sample_pps_rejects_fractional_weights(spark):
    import pytest

    from realtime_market_data_pipeline_spark.operators.text import (
        weighted_sample_pps,
    )

    # Exact-integer membership casts w to DECIMAL(38,0) (rounds) while the
    # total casts to long (truncates) — fractional weights would silently
    # break p_i = n*w/Σw, so the contract rejects them loudly.
    df = spark.createDataFrame([(1, 1.5), (2, 2.5)], "doc_id long, w double")
    with pytest.raises(TypeError, match="integral weight column"):
        weighted_sample_pps(df, "w", n_target=1, id_col="doc_id")


def test_zscore_overflow_guard_fails_loudly(spark):
    """Decimal overflow in the z² certificate must raise, never silently
    drop rows: natively under ANSI (the session default), via the fused
    raise_error predicate when a session disables ANSI (overflow -> NULL).
    Includes the join-shaped reproduction: a standalone guard conjunct is
    DEFEATED by Catalyst pushing the s-side-only `nvar > 0` below the
    join, which drops the overflowed group before the guard evaluates —
    the fused form must raise there too."""
    import pytest
    from pyspark.sql import functions as F

    from realtime_market_data_pipeline_spark.queries import (
        _overflow_guarded_predicate,
    )

    d0 = "decimal(38,0)"
    big = "9" * 25  # (10^25)^2 has ~50 digits: overflows DECIMAL(38,0)

    def build(level):
        # ANSI-vs-NULL overflow behavior is captured at ANALYSIS time, so
        # the plan must be constructed under the conf being tested.
        # level="second": dev/nvar fit, their squares overflow.
        # level="first": nvar itself is an overflowing product — the guard
        # must catch NULL at ANY level, not only the final squares.
        df = spark.createDataFrame([(big,)], "x string").select(
            F.col("x").cast(d0).alias("dev"), F.col("x").cast(d0).alias("raw")
        )
        dev = F.col("dev")
        nvar = (
            F.col("raw")
            if level == "second"
            else F.col("raw") * F.col("raw") * F.col("raw")
        )
        dev2 = dev * dev
        thr = F.lit(16).cast(d0) * nvar
        keep = _overflow_guarded_predicate(
            (nvar > 0) & (dev2 > thr), dev, nvar, dev2, thr, msg="GUARD-FIRED"
        )
        return df.where(keep)

    def build_joined():
        # mirrors the query's real shape: per-group decimal sums that
        # overflow on the AGGREGATED side, broadcast-joined back to rows —
        # the shape where conjunct pushdown silently dropped the group
        e = spark.createDataFrame(
            [("a", big), ("a", big)], "g string, x string"
        ).select("g", F.col("x").cast(d0).alias("xi"))
        s = e.groupBy("g").agg(
            F.sum(F.col("xi") * F.col("xi") * F.col("xi")).alias("nvar")
        )
        j = e.join(F.broadcast(s), "g")
        nvar, xi = F.col("nvar"), F.col("xi")
        keep = _overflow_guarded_predicate(
            (nvar > 0) & (xi * xi > nvar), nvar, xi * xi, msg="GUARD-FIRED"
        )
        return j.where(keep)

    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
            build("second").collect()
        spark.conf.set("spark.sql.ansi.enabled", "false")
        for level in ("second", "first"):
            with pytest.raises(Exception, match="GUARD-FIRED"):
                build(level).collect()
        with pytest.raises(Exception, match="GUARD-FIRED"):
            build_joined().collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)
