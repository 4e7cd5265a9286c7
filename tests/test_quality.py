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
