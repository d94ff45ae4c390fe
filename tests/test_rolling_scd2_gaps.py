"""Session-12 operators: rolling_active_users (exact sliding distinct via
the coverage explode), scd2_intervals (type-2 dimension build),
gap_stats (exact integer order-statistic inter-arrival profile), and
calibration_bins (integer reliability table).  Hand-computed cases, NULL
contracts, a brute-force replay for the rolling window, and the plan
shapes that make each scale."""

import pytest
from pyspark.sql import functions as F

from evalidate_spark.functions.classifier import calibration_bins
from evalidate_spark.operators.behavior import rolling_active_users
from evalidate_spark.operators.reconcile import scd2_intervals
from evalidate_spark.operators.sessions import gap_stats

_DAY_US = 86_400_000_000


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, event_type string"
    ).selectExpr(
        "user_id", "event_id", "cast(ts_s as timestamp) ts", "event_type"
    )


class TestRollingActiveUsers:
    def test_hand_case(self, spark):
        # u1 active on days d, d+1, d+8; u2 on d+4; NULL key/ts excluded
        df = _ev(spark, [
            (1, 1, "2026-01-01 10:00:00", "a"),
            (1, 2, "2026-01-02 10:00:00", "a"),
            (1, 3, "2026-01-02 11:00:00", "a"),   # same day: one pair
            (1, 4, "2026-01-09 10:00:00", "a"),
            (2, 5, "2026-01-05 10:00:00", "a"),
            (2, 6, None, "a"),
            (None, 7, "2026-01-01 10:00:00", "a"),
        ])
        out = {r.bucket: (r.daily_users, r.rolling_users)
               for r in rolling_active_users(df, window_buckets=3).collect()}
        d = 1767261600000000 // _DAY_US  # 2026-01-01 bucket
        # full spine, zero-day gaps included
        assert sorted(out) == list(range(d, d + 9))
        assert out[d] == (1, 1)
        assert out[d + 1] == (1, 1)
        assert out[d + 2] == (0, 1)       # u1 from d+1 still in window
        assert out[d + 3] == (0, 1)
        assert out[d + 4] == (1, 1)       # u2 only; u1's d+1 expired
        assert out[d + 6] == (0, 1)       # u2 from d+4
        assert out[d + 7] == (0, 0)       # nobody in {d+5..d+7}
        assert out[d + 8] == (1, 1)

    def test_window_one_equals_daily(self, spark):
        df = _ev(spark, [
            (1, 1, "2026-01-01 10:00:00", "a"),
            (2, 2, "2026-01-01 11:00:00", "a"),
            (1, 3, "2026-01-03 10:00:00", "a"),
        ])
        for r in rolling_active_users(df, window_buckets=1).collect():
            assert r.daily_users == r.rolling_users

    def test_brute_force_replay(self, spark):
        import random

        rng = random.Random(42)
        rows = [
            (rng.randrange(8), i,
             "2026-01-%02d 0%d:00:00" % (rng.randrange(1, 29), rng.randrange(9)),
             "a")
            for i in range(300)
        ]
        df = _ev(spark, rows)
        w = 7
        got = {r.bucket: (r.daily_users, r.rolling_users)
               for r in rolling_active_users(df, window_buckets=w).collect()}
        # pure-Python oracle over the same (user, day) pairs
        pairs = {
            (r.user_id, r.us // _DAY_US)
            for r in df.select("user_id", F.unix_micros("ts").alias("us")).collect()
        }
        days = [d for _, d in pairs]
        lo, hi = min(days), max(days)
        assert sorted(got) == list(range(lo, hi + 1))
        for b in range(lo, hi + 1):
            daily = len({u for (u, d) in pairs if d == b})
            rolling = len({u for (u, d) in pairs if b - w + 1 <= d <= b})
            assert got[b] == (daily, rolling), b

    def test_contracts(self, spark):
        df = _ev(spark, [(1, 1, "2026-01-01 10:00:00", "a")])
        with pytest.raises(ValueError, match="window_buckets"):
            rolling_active_users(df, window_buckets=0)
        with pytest.raises(ValueError, match="bucket_s"):
            rolling_active_users(df, bucket_s=0)

    def test_explode_on_pairs_not_events(self, spark):
        # the coverage explode must sit ABOVE the distinct aggregate:
        # generators multiply distinct (key, day) pairs, never raw events
        plan = (
            rolling_active_users(_ev(spark, [
                (1, 1, "2026-01-01 10:00:00", "a"),
                (1, 2, "2026-01-01 11:00:00", "a"),
            ]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        gen = plan.index("Generate explode")
        agg = plan.index("HashAggregate")
        assert gen < plan.rindex("HashAggregate")  # aggregates below it exist
        assert "explode(sequence" in plan


class TestScd2Intervals:
    def _log(self, spark):
        return _ev(spark, [
            (1, 1, "2026-01-01 10:00:00", "a"),
            (1, 2, "2026-01-02 10:00:00", "a"),   # consecutive dup: no version
            (1, 3, "2026-01-02 11:00:00", "b"),
            (1, 4, "2026-01-09 10:00:00", "a"),   # back to a: NEW version
            (2, 5, "2026-01-05 10:00:00", "x"),
        ])

    def test_hand_history(self, spark):
        out = scd2_intervals(
            self._log(spark), ["user_id"], ["event_type"], "ts", ["event_id"]
        ).collect()
        h1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.version_ix)
        assert [(r.event_type, r.version_ix, r.is_current) for r in h1] == [
            ("a", 1, False), ("b", 2, False), ("a", 3, True)]
        # half-open intervals chain exactly
        assert h1[0].valid_to_us == h1[1].valid_from_us
        assert h1[1].valid_to_us == h1[2].valid_from_us
        assert h1[2].valid_to_us is None
        h2 = [r for r in out if r.user_id == 2]
        assert len(h2) == 1 and h2[0].is_current and h2[0].version_ix == 1

    def test_null_ts_bootstrap(self, spark):
        df = _ev(spark, [
            (1, 1, None, "boot"),
            (1, 2, None, "boot2"),               # second NULL-ts change
            (1, 3, "2026-01-01 10:00:00", "real"),
        ])
        out = sorted(
            scd2_intervals(df, ["user_id"], ["event_type"], "ts",
                           ["event_id"]).collect(),
            key=lambda r: r.version_ix,
        )
        assert [r.event_type for r in out] == ["boot", "boot2", "real"]
        # the first NULL-ts version is CLOSED even though its successor's
        # from is NULL; only the last version is current
        assert [r.is_current for r in out] == [False, False, True]
        assert out[0].valid_from_us is None and out[0].valid_to_us is None

    def test_null_value_changes(self, spark):
        df = _ev(spark, [
            (1, 1, "2026-01-01 10:00:00", "a"),
            (1, 2, "2026-01-02 10:00:00", None),   # a -> NULL is a change
            (1, 3, "2026-01-03 10:00:00", None),   # NULL -> NULL is NOT
            (1, 4, "2026-01-04 10:00:00", "a"),
        ])
        out = scd2_intervals(df, ["user_id"], ["event_type"], "ts",
                             ["event_id"]).collect()
        assert [r.event_type for r in
                sorted(out, key=lambda r: r.version_ix)] == ["a", None, "a"]

    def test_multi_value_cols(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "2026-01-01", "a", 10), (1, 2, "2026-01-02", "a", 20),
             (1, 3, "2026-01-03", "a", 20)],
            "k long, seq long, d string, v1 string, v2 long",
        ).selectExpr("k", "seq", "cast(d as timestamp) ts", "v1", "v2")
        out = scd2_intervals(df, ["k"], ["v1", "v2"], "ts", ["seq"]).collect()
        assert len(out) == 2  # v2 change mints a version; the dup does not

    def test_contracts(self, spark):
        df = self._log(spark)
        with pytest.raises(ValueError, match="key_cols and value_cols"):
            scd2_intervals(df, [], ["event_type"], "ts")

    def test_single_exchange_plan(self, spark):
        plan = (
            scd2_intervals(self._log(spark), ["user_id"], ["event_type"],
                           "ts", ["event_id"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # both windows hash-partition on the same key: one real exchange
        assert plan.count("Exchange hashpartitioning") == 1


class TestGapStats:
    def test_hand_case(self, spark):
        df = _ev(spark, [
            (1, 1, "2026-01-01 10:00:00", "a"),
            (1, 2, "2026-01-02 10:00:00", "a"),   # +86400s
            (1, 3, "2026-01-02 11:00:00", "a"),   # +3600s
            (1, 4, "2026-01-09 10:00:00", "a"),   # +601200s
            (2, 5, "2026-01-05 10:00:00", "a"),   # singleton
            (2, 6, None, "a"),                     # NULL ts: off the timeline
        ])
        out = {r.user_id: r for r in gap_stats(df).collect()}
        r1 = out[1]
        assert (r1.n_events, r1.n_gaps) == (4, 3)
        assert r1.min_gap_us == 3_600_000_000
        # exact lower order statistics: ceil(.5*3)=2nd, ceil(.9*3)=3rd
        assert r1.p50_gap_us == 86_400_000_000
        assert r1.p90_gap_us == 601_200_000_000
        assert r1.max_gap_us == 601_200_000_000
        assert r1.mean_gap_us == (3_600_000_000 + 86_400_000_000
                                  + 601_200_000_000) // 3
        r2 = out[2]
        assert (r2.n_events, r2.n_gaps) == (1, 0)
        assert r2.min_gap_us is None and r2.p50_gap_us is None
        assert r2.mean_gap_us is None

    def test_quantile_indexing_even_n(self, spark):
        # 4 gaps of 1h/2h/3h/4h: p50 -> ceil(2.0)=2nd=2h, p90 -> ceil(3.6)=4th
        rows, t = [], 0
        for i, h in enumerate([0, 1, 3, 6, 10]):
            rows.append((1, i, "2026-01-01 %02d:00:00" % h, "a"))
        out = gap_stats(_ev(spark, rows), quantiles=(50, 90)).collect()[0]
        assert out.p50_gap_us == 2 * 3_600_000_000
        assert out.p90_gap_us == 4 * 3_600_000_000

    def test_contracts(self, spark):
        df = _ev(spark, [(1, 1, "2026-01-01 10:00:00", "a")])
        with pytest.raises(ValueError, match="quantiles"):
            gap_stats(df, quantiles=(0,))
        with pytest.raises(ValueError, match="quantiles"):
            gap_stats(df, quantiles=(101,))

    def test_single_exchange_plan(self, spark):
        plan = (
            gap_stats(_ev(spark, [(1, 1, "2026-01-01 10:00:00", "a")]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        # lag window, rank window, and the final aggregate all live on the
        # entity hash: one data exchange (+ nothing partitionless)
        assert plan.count("Exchange hashpartitioning") == 1


class TestCalibrationBins:
    def test_perfectly_calibrated_step(self, spark):
        df = spark.createDataFrame(
            [(i, i >= 50) for i in range(100)], "score long, label boolean")
        out = sorted(calibration_bins(df, n_bins=4).collect(),
                     key=lambda r: r.bin_ix)
        assert [(r.bin_ix, r.bin_lo, r.bin_hi, r.n, r.n_pos, r.pos_rate_bp)
                for r in out] == [
            (0, 0, 24, 25, 0, 0), (1, 25, 49, 25, 0, 0),
            (2, 50, 74, 25, 25, 10000), (3, 75, 99, 25, 25, 10000)]

    def test_uneven_width_exact_edges(self, spark):
        # range 0..9 (width 10) into 3 bins: integer edges 0-3, 4-6, 7-9
        df = spark.createDataFrame(
            [(i, True) for i in range(10)], "score long, label boolean")
        out = sorted(calibration_bins(df, n_bins=3).collect(),
                     key=lambda r: r.bin_ix)
        assert [(r.bin_lo, r.bin_hi, r.n) for r in out] == [
            (0, 3, 4), (4, 6, 3), (7, 9, 3)]

    def test_nulls_excluded_and_constant_score(self, spark):
        df = spark.createDataFrame(
            [(7, True), (7, False), (None, True), (7, None)],
            "score long, label boolean")
        out = calibration_bins(df, n_bins=10).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.bin_ix, r.bin_lo, r.bin_hi, r.n, r.n_pos, r.pos_rate_bp) == (
            0, 7, 7, 2, 1, 5000)

    def test_contracts(self, spark):
        df = spark.createDataFrame([(1, True)], "score long, label boolean")
        with pytest.raises(ValueError, match="n_bins"):
            calibration_bins(df, n_bins=0)

    def test_negative_scores(self, spark):
        df = spark.createDataFrame(
            [(-10, False), (-1, False), (0, True), (9, True)],
            "score long, label boolean")
        out = sorted(calibration_bins(df, n_bins=2).collect(),
                     key=lambda r: r.bin_ix)
        assert [(r.bin_lo, r.bin_hi, r.n, r.n_pos) for r in out] == [
            (-10, -1, 2, 0), (0, 9, 2, 2)]
