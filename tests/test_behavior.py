"""Behavioral analytics operators: funnel_steps, cohort_retention."""

import datetime as dt

import pytest

from evalidate_spark.operators.behavior import cohort_retention, funnel_steps


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


T0 = dt.datetime(2024, 1, 1)


def _at(s):
    return T0 + dt.timedelta(seconds=s)


class TestFunnelSteps:
    def test_ordered_conversion(self, spark):
        rows = [
            # u1 completes A->B->C in order
            (1, _at(0), 1, "A"), (2, _at(10), 1, "B"), (3, _at(20), 1, "C"),
            # u2 does B BEFORE A: reaches A only (B never re-occurs after)
            (4, _at(5), 2, "B"), (5, _at(6), 2, "A"),
            # u3 does A then B, no C
            (6, _at(0), 3, "A"), (7, _at(1), 3, "B"),
            # u4 only C: not in the funnel at all
            (8, _at(0), 4, "C"),
        ]
        out = funnel_steps(_ev(spark, rows), ["A", "B", "C"])
        got = {
            r.step_ix: (r.step, r.n_entities, r.conv_from_prev_bp,
                        r.conv_from_first_bp)
            for r in out.collect()
        }
        assert got == {
            1: ("A", 3, None, None),
            2: ("B", 2, 6666, 6666),
            3: ("C", 1, 5000, 3333),
        }

    def test_same_timestamp_counts(self, spark):
        rows = [(1, _at(0), 1, "A"), (2, _at(0), 1, "B")]
        out = funnel_steps(_ev(spark, rows), ["A", "B"]).collect()
        assert {r.step: r.n_entities for r in out} == {"A": 1, "B": 1}

    def test_earliest_qualifying_not_earliest_overall(self, spark):
        # u1: B at t=5 (before A at t=10), B again at t=15.  The B frontier
        # must anchor at 15, so a C at t=12 does NOT qualify.
        rows = [
            (1, _at(5), 1, "B"), (2, _at(10), 1, "A"),
            (3, _at(15), 1, "B"), (4, _at(12), 1, "C"),
        ]
        out = funnel_steps(_ev(spark, rows), ["A", "B", "C"]).collect()
        assert {r.step: r.n_entities for r in out} == {"A": 1, "B": 1, "C": 0}

    def test_null_key_or_ts_excluded(self, spark):
        rows = [(1, _at(0), None, "A"), (2, None, 1, "A"), (3, _at(0), 1, "A")]
        out = funnel_steps(_ev(spark, rows), ["A", "B"]).collect()
        assert {r.step: r.n_entities for r in out} == {"A": 1, "B": 0}

    def test_repeated_step_type(self, spark):
        # view -> click -> view: second view must be at/after the click
        rows = [
            (1, _at(0), 1, "view"), (2, _at(5), 1, "click"),
            (3, _at(9), 1, "view"),
            (4, _at(0), 2, "view"), (5, _at(5), 2, "click"),
        ]
        out = funnel_steps(_ev(spark, rows), ["view", "click", "view"]).collect()
        got = {r.step_ix: r.n_entities for r in out}
        assert got == {1: 2, 2: 2, 3: 1}

    def test_needs_two_steps(self, spark):
        with pytest.raises(ValueError):
            funnel_steps(_ev(spark, []), ["A"])


class TestCohortRetention:
    def test_matrix(self, spark):
        day = 86400
        rows = [
            # u1 first in bucket 0, active buckets 0 and 2
            (1, _at(0), 1, "x"), (2, _at(2 * day + 5), 1, "x"),
            # u2 first in bucket 0, active bucket 0 only (two events same bucket)
            (3, _at(10), 2, "x"), (4, _at(20), 2, "x"),
            # u3 first in bucket 1
            (5, _at(day + 1), 3, "x"),
        ]
        out = cohort_retention(_ev(spark, rows), period_s=day)
        base = dt.datetime(1970, 1, 1)
        b0 = (T0 - base).days  # T0 as an epoch-day bucket
        got = {
            (r.cohort_bucket - b0, r.period_offset): (
                r.n_active, r.cohort_size, r.retention_bp)
            for r in out.collect()
        }
        assert got == {
            (0, 0): (2, 2, 10000),
            (0, 2): (1, 2, 5000),
            (1, 0): (1, 1, 10000),
        }

    def test_null_excluded_and_bad_period(self, spark):
        rows = [(1, _at(0), None, "x"), (2, None, 1, "x")]
        assert cohort_retention(_ev(spark, rows), period_s=60).count() == 0
        with pytest.raises(ValueError):
            cohort_retention(_ev(spark, rows), period_s=0)

    def test_pre_epoch_floor_not_truncate(self, spark):
        # a pre-1970 timestamp must floor to the PREVIOUS bucket, not
        # truncate toward zero into bucket 0
        rows = [(1, dt.datetime(1969, 12, 31, 23, 0, 0), 1, "x")]
        out = cohort_retention(_ev(spark, rows), period_s=86400).collect()
        assert out[0].cohort_bucket == -1
