"""rate_changepoints (moving-window mean-shift detection over densified
time buckets) and completeness_trend (exact integer least-squares
null-rate slope per column): hand-built level shifts, zero-bucket
densification, edge NULLing, sign-factored slope division, and the
aggregate-first plan shapes."""

import pytest

from evalidate_spark.operators.table_checks import (
    completeness_trend,
    rate_changepoints,
)

_DAY = 86400


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, value double"
    ).selectExpr("event_id", "cast(ts_s as timestamp) ts", "value")


def _level_shift(spark, low=10, high=40, days_low=10, days_high=10):
    rows, eid = [], 0
    for d in range(1, days_low + 1):
        for i in range(low):
            rows.append((eid, "2026-01-%02d 0%d:00:00" % (d, i % 9), 1.0))
            eid += 1
    for d in range(days_low + 1, days_low + days_high + 1):
        for i in range(high):
            rows.append(
                (eid, "2026-01-%02d 0%d:%02d:00" % (d, i % 9, i % 60), 1.0))
            eid += 1
    return _ev(spark, rows)


class TestRateChangepoints:
    def test_level_shift_peaks_at_boundary(self, spark):
        out = {r.bucket_s: r for r in rate_changepoints(
            _level_shift(spark), bucket_s=_DAY, lookback=3, shift_bp=5000
        ).collect()}
        buckets = sorted(out)
        assert len(buckets) == 20
        # edges: first 3 and last 2 buckets have incomplete windows
        for b in buckets[:3] + buckets[-2:]:
            r = out[b]
            assert r.sum_before is None and r.ratio_bp is None
            assert r.shift is False
        # steady state before the shift: ratio exactly 10000, no flag
        r = out[buckets[5]]
        assert (r.sum_before, r.sum_after, r.ratio_bp, r.shift) == (
            30, 30, 10000, False)
        # the boundary bucket (day 11, index 10) peaks at 40000 bp
        peak = out[buckets[10]]
        assert (peak.sum_before, peak.sum_after, peak.ratio_bp, peak.shift) == (
            30, 120, 40000, True)
        # flags are confined to a lookback-neighborhood of the boundary
        flagged = [i for i, b in enumerate(buckets) if out[b].shift]
        assert flagged == [8, 9, 10, 11]
        # steady state after: back to 10000
        assert out[buckets[14]].ratio_bp == 10000

    def test_zero_buckets_densified_and_stall_flags(self, spark):
        # 6 busy days, then 3 SILENT days (no rows at all), then 3 busy:
        # the silent days must appear with n_events=0 and the entry into
        # silence must flag via the ratio drop
        rows, eid = [], 0
        for d in list(range(1, 7)) + list(range(10, 13)):
            for i in range(10):
                rows.append((eid, "2026-01-%02d 05:%02d:00" % (d, i), 1.0))
                eid += 1
        out = {r.bucket_s: r for r in rate_changepoints(
            _ev(spark, rows), bucket_s=_DAY, lookback=3, shift_bp=5000
        ).collect()}
        buckets = sorted(out)
        assert len(buckets) == 12  # spine covers the gap
        assert [out[b].n_events for b in buckets] == [
            10, 10, 10, 10, 10, 10, 0, 0, 0, 10, 10, 10]
        # bucket index 6 (first silent day): before=30, after=0 -> drop
        r6 = out[buckets[6]]
        assert (r6.sum_before, r6.sum_after, r6.ratio_bp, r6.shift) == (
            30, 0, 0, True)
        # bucket index 9 (first busy day after silence): before=0, after=30
        # -> spike from literal zero, ratio NULL but still flagged
        r9 = out[buckets[9]]
        assert (r9.sum_before, r9.sum_after, r9.ratio_bp, r9.shift) == (
            0, 30, None, True)

    def test_steady_stream_never_flags(self, spark):
        rows = [(d * 100 + i, "2026-01-%02d 05:%02d:00" % (d, i), 1.0)
                for d in range(1, 11) for i in range(7)]
        out = rate_changepoints(_ev(spark, rows), bucket_s=_DAY,
                                lookback=2, shift_bp=2000).collect()
        assert not any(r.shift for r in out)

    def test_contracts(self, spark):
        df = _ev(spark, [(1, "2026-01-01 05:00:00", 1.0)])
        with pytest.raises(ValueError, match="bucket_s"):
            rate_changepoints(df, bucket_s=0)
        with pytest.raises(ValueError, match="lookback"):
            rate_changepoints(df, lookback=0)
        with pytest.raises(ValueError, match="shift_bp"):
            rate_changepoints(df, shift_bp=0)

    def test_aggregate_before_ordered_window(self, spark):
        # the partitionless ordered window must run over the bucket
        # table (post-aggregate), never the raw events
        plan = (
            rate_changepoints(_level_shift(spark, days_low=2, days_high=2))
            ._jdf.queryExecution().executedPlan().toString()
        )
        agg = plan.rindex("HashAggregate")
        win = plan.index("Window [")
        assert win < agg  # window sits ABOVE the bucket aggregate


class TestCompletenessTrend:
    def test_rising_null_rate_exact_slope(self, spark):
        # day d (1..10) has d nulls of 10 rows: y = 1000·d bp,
        # perfect line, slope = 1000 bp/bucket = 100000 cbp
        rows = []
        for d in range(1, 11):
            for i in range(10):
                v = None if i < d else float(i)
                rows.append((d * 100 + i, "2026-01-%02d 05:00:00" % d, v))
        out = {r.column: r for r in completeness_trend(
            _ev(spark, rows), ["value", "event_id"]).collect()}
        v = out["value"]
        assert (v.n_buckets, v.first_bp, v.last_bp, v.mean_bp,
                v.slope_cbp) == (10, 1000, 10000, 5500, 100000)
        e = out["event_id"]
        assert (e.first_bp, e.last_bp, e.slope_cbp) == (0, 0, 0)

    def test_falling_slope_negative_truncation(self, spark):
        # y goes 3000 -> 0 over 4 buckets in uneven steps: num negative;
        # Spark div must equal the sign-factored floor replay
        rates = [3, 2, 2, 0]  # nulls of 10 per day
        rows = []
        for d, k in enumerate(rates, start=1):
            for i in range(10):
                v = None if i < k else 1.0
                rows.append((d * 100 + i, "2026-01-%02d 05:00:00" % d, v))
        out = completeness_trend(_ev(spark, rows), ["value"]).collect()[0]
        # moments: x=0..3, y=[3000,2000,2000,0]; k=4 sx=6 sxx=14
        # sy=7000 sxy=0+2000+4000+0=6000; num=4*6000-6*7000=-18000; den=4*14-36=20
        # slope = -1 * (100*18000) div 20 = -90000
        assert out.slope_cbp == -90000

    def test_single_bucket_null_slope(self, spark):
        rows = [(i, "2026-01-01 05:00:00", None) for i in range(5)]
        out = completeness_trend(_ev(spark, rows), ["value"]).collect()[0]
        assert out.n_buckets == 1
        assert out.first_bp == out.last_bp == 10000
        assert out.slope_cbp is None

    def test_null_ts_excluded(self, spark):
        rows = [(1, "2026-01-01 05:00:00", None), (2, None, None)]
        out = completeness_trend(_ev(spark, rows), ["value"]).collect()[0]
        assert out.n_buckets == 1 and out.first_bp == 10000

    def test_contracts(self, spark):
        df = _ev(spark, [(1, "2026-01-01 05:00:00", 1.0)])
        with pytest.raises(ValueError, match="at least one column"):
            completeness_trend(df, [])
        with pytest.raises(ValueError, match="bucket_s"):
            completeness_trend(df, ["value"], bucket_s=0)

    def test_one_pass_over_events(self, spark):
        # every column's null count folds into the SAME bucket groupBy:
        # exactly one scan of the input in the plan
        plan = (
            completeness_trend(
                _ev(spark, [(1, "2026-01-01 05:00:00", 1.0)]),
                ["value", "event_id"],
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1
