"""Property-based equivalence: the split_hours skew-relief sessionization
must EXACTLY reproduce the unsplit result for arbitrary event patterns —
including events landing exactly on bucket boundaries, gaps exactly equal
to the threshold, sessions spanning many buckets, and empty buckets.

A pure-Python oracle recomputes the expected bounds independently, so a
bug shared by both Spark paths can't hide."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from evalidate_spark.operators.sessions import session_bounds

GAP_MIN = 30
GAP_US = GAP_MIN * 60 * 1_000_000
HOUR_US = 3_600_000_000

# offsets in MINUTES over ~5 hours: dense enough to merge, sparse enough
# to split, with exact-boundary values (0, 60, 90 = exactly gap*3...) likely
EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),          # user
    st.integers(min_value=0, max_value=300),        # minutes offset
)


def oracle(rows):
    """events (user, minute) → {(user, session_ix, n, start_us, end_us)}"""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, m in rows:
        by_user[u].append(m * 60_000_000 + BASE_US)
    out = set()
    for u, ts in by_user.items():
        ts.sort()
        six, n, start = 0, 0, None
        prev = None
        for t in ts:
            if prev is None or t - prev > GAP_US:
                if prev is not None:
                    out.add((u, six, n, start, prev))
                six += 1
                n, start = 0, t
            n += 1
            prev = t
        out.add((u, six, n, start, prev))
    return out


BASE_US = 1_767_225_600_000_000  # 2026-01-01 00:00:00 UTC in micros


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(rows=st.lists(EVENT, min_size=1, max_size=40))
def test_split_sessionization_equals_unsplit_and_oracle(spark_holder, rows):
    spark = spark_holder
    df = spark.createDataFrame(
        [(u, m) for u, m in rows], "user_id long, m long"
    ).selectExpr(
        "user_id",
        "timestamp_ntz'2026-01-01 00:00:00' + make_interval(0,0,0,0,0, m, 0) AS ts",
    )
    want = oracle(rows)
    key = lambda d: {
        (r["user_id"], r["session_ix"], r["n_events"], r["t_start_us"], r["t_end_us"])
        for r in d.collect()
    }
    unsplit = key(session_bounds(df, gap_minutes=GAP_MIN))
    assert unsplit == want
    # 1h buckets: many boundary crossings at this density
    assert key(session_bounds(df, gap_minutes=GAP_MIN, split_hours=1)) == want
    # 2h buckets: different stitch pattern, same answer
    assert key(session_bounds(df, gap_minutes=GAP_MIN, split_hours=2)) == want


class TestTrailingFeatures:
    def test_hand_computed_with_boundary(self, spark):
        from evalidate_spark.operators.sessions import trailing_window_features

        # u1: t=0, 3600s, 3601s, 7300s — frame is INCLUSIVE at -window_s
        rows = [
            (1, "2024-01-01 00:00:00", 10, "view", 1.0),
            (2, "2024-01-01 01:00:00", 10, "error", 2.0),   # includes t=0
            (3, "2024-01-01 01:00:01", 10, "view", 4.0),    # t=0 aged out
            (4, "2024-01-01 02:01:40", 10, "error", None),  # alone; NULL val
            (5, "2024-01-01 00:30:00", 20, "view", 8.0),
            (6, None, 10, "view", 16.0),                    # NULL ts masked
        ]
        df = spark.createDataFrame(
            rows, "event_id int, ts_s string, user_id int, event_type string, value double"
        ).selectExpr(
            "event_id", "cast(ts_s as timestamp) as ts", "user_id",
            "event_type", "value",
        )
        got = {
            r["event_id"]: r
            for r in trailing_window_features(df, window_s=3600).collect()
        }
        assert (got[1]["n_w"], got[1]["sum_value_w"], got[1]["n_flag_w"]) == (1, 1.0, 0)
        assert (got[2]["n_w"], got[2]["sum_value_w"], got[2]["n_flag_w"]) == (2, 3.0, 1)
        assert (got[3]["n_w"], got[3]["sum_value_w"], got[3]["n_flag_w"]) == (2, 6.0, 1)
        # frame with only a NULL value: count 1, sum NULL, flag 1
        assert (got[4]["n_w"], got[4]["sum_value_w"], got[4]["n_flag_w"]) == (1, None, 1)
        assert got[5]["n_w"] == 1
        # NULL ts passes through fully masked
        assert got[6]["ts_us"] is None and got[6]["n_w"] is None
        assert got[6]["sum_value_w"] is None and got[6]["n_flag_w"] is None

    def test_single_window_pass_plan(self, spark):
        from evalidate_spark.operators.sessions import trailing_window_features

        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = trailing_window_features(df, window_s=3600)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # all three aggregates share one Window operator (one shuffle+sort)
        assert plan.count("Window [") == 1


class TestSuppressRepeats:
    """Telemetry repeat-suppression: consecutive semantics, window
    boundary, NULL ts/key/value contracts, single-window plan."""

    def _kept(self, spark, rows):
        import datetime as dt  # noqa: F401

        from evalidate_spark.operators.sessions import suppress_repeats

        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        out = suppress_repeats(df)
        return {r.event_id: r.kept for r in out.collect()}

    def test_contract_matrix(self, spark):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        sec = dt.timedelta(seconds=1)
        rows = [
            (1, t0, 10, "click"),
            (2, t0 + 10 * sec, 10, "click"),      # repeat in window -> drop
            (3, t0 + 20 * sec, 10, "view"),       # value change -> keep
            (4, t0 + 3621 * sec, 10, "view"),     # 3601s after #3 -> keep
            (5, t0 + 3622 * sec, 10, "view"),     # 1s after #4 -> drop
            (6, None, 10, "view"),                # NULL ts -> keep
            (7, t0, None, "click"),               # NULL key partition
            (8, t0 + sec, None, "click"),         # repeat in NULL part -> drop
            (9, t0 + 2 * sec, 11, None),
            (10, t0 + 3 * sec, 11, None),         # NULL value null-safe -> drop
        ]
        got = self._kept(spark, rows)
        assert got == {1: True, 2: False, 3: True, 4: True, 5: False,
                       6: True, 7: True, 8: False, 9: True, 10: False}

    def test_window_boundary_inclusive(self, spark):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (1, t0, 1, "a"),
            (2, t0 + dt.timedelta(seconds=3600), 1, "a"),  # exactly W -> drop
            (3, t0 + dt.timedelta(seconds=7201), 1, "a"),  # W+1 after #2 -> keep
        ]
        got = self._kept(spark, rows)
        assert got == {1: True, 2: False, 3: True}

    def test_null_ts_never_suppresses_successor(self, spark):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (1, None, 1, "a"),  # sorts first, no timeline position
            (2, t0, 1, "a"),    # predecessor is NULL-ts -> keep
        ]
        got = self._kept(spark, rows)
        assert got == {1: True, 2: True}

    def test_single_window_plan(self, spark):
        import datetime as dt

        from evalidate_spark.operators.sessions import suppress_repeats

        df = spark.createDataFrame(
            [(1, dt.datetime(2026, 1, 1), 1, "a")],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        plan = suppress_repeats(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1
        assert plan.count("Window") == 1


class TestSuppressRepeatsOrderCol:
    def test_missing_tie_break_column_raises(self, spark):
        import datetime as dt

        from evalidate_spark.operators.sessions import suppress_repeats

        df = spark.createDataFrame(
            [(dt.datetime(2026, 1, 1), 1, "a")],
            "ts timestamp, user_id long, event_type string",
        )
        with pytest.raises(ValueError, match="tie-break"):
            suppress_repeats(df)

    def test_renamed_id_column_is_honoured(self, spark):
        import datetime as dt

        from evalidate_spark.operators.sessions import suppress_repeats

        t0 = dt.datetime(2026, 1, 1)
        # two same-ts events with values (a, b) then a third 'a': with
        # evt_id order the predecessor chain is a->b->a (all kept); an
        # unparameterized ts-only order could pick a->a (suppressed)
        df = spark.createDataFrame(
            [(1, t0, 1, "a"), (2, t0, 1, "b"),
             (3, t0 + dt.timedelta(seconds=1), 1, "a")],
            "evt_id long, ts timestamp, user_id long, event_type string",
        )
        out = suppress_repeats(df, order_col="evt_id")
        got = {r.evt_id: r.kept for r in out.collect()}
        assert got == {1: True, 2: True, 3: True}
