"""Reconciliation operators: table_diff, reconcile_sums,
changelog_compact, survivorship."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from evalidate_spark.operators.reconcile import (
    changelog_compact,
    reconcile_sums,
    survivorship,
    table_diff,
)


class TestTableDiff:
    def _versions(self, spark):
        before = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
            "id long, name string, v int",
        )
        after = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 25), (4, None, 40), (5, "e", 50)],
            "id long, name string, v int",
        )
        return before, after

    def test_added_removed_changed(self, spark):
        before, after = self._versions(spark)
        got = {
            r.id: (r.change, r.changed_cols)
            for r in table_diff(before, after, ["id"]).collect()
        }
        # id=1 identical -> absent; id=4 has NULL name both sides (null-safe
        # equal) -> absent; id=2 changed both cols; 3 removed; 5 added
        assert got == {
            2: ("changed", "name,v"),
            3: ("removed", ""),
            5: ("added", ""),
        }

    def test_empty_diff_is_the_green_gate(self, spark):
        before, _ = self._versions(spark)
        assert table_diff(before, before, ["id"]).count() == 0

    def test_null_vs_value_is_a_change(self, spark):
        b = spark.createDataFrame([(1, None)], "id long, name string")
        a = spark.createDataFrame([(1, "x")], "id long, name string")
        rows = table_diff(b, a, ["id"]).collect()
        assert [(r.change, r.changed_cols) for r in rows] == [("changed", "name")]

    def test_null_key_surfaces_as_removed_plus_added(self, spark):
        b = spark.createDataFrame([(None, "x")], "id string, name string")
        a = spark.createDataFrame([(None, "x")], "id string, name string")
        got = sorted(r.change for r in table_diff(b, a, ["id"]).collect())
        assert got == ["added", "removed"]

    def test_compare_cols_subset_and_composite_key(self, spark):
        b = spark.createDataFrame(
            [(1, "x", "p", 1), (1, "y", "p", 2)], "k1 long, k2 string, p string, v int"
        )
        a = spark.createDataFrame(
            [(1, "x", "q", 9), (1, "y", "p", 2)], "k1 long, k2 string, p string, v int"
        )
        rows = table_diff(b, a, ["k1", "k2"], compare_cols=["p"]).collect()
        assert [(r.k1, r.k2, r.change, r.changed_cols) for r in rows] == [
            (1, "x", "changed", "p")
        ]

    def test_bad_args(self, spark):
        b, a = self._versions(spark)
        with pytest.raises(ValueError):
            table_diff(b, a, [])
        with pytest.raises(ValueError):
            table_diff(b, a, ["id"], compare_cols=["nope"])

    def test_single_join_plan(self, spark):
        b, a = self._versions(spark)
        plan = (
            table_diff(b, a, ["id"])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("Join FullOuter") == 1


class TestReconcileSums:
    def test_accounting_identity(self, spark):
        fact = spark.createDataFrame(
            [(1, 5.0), (1, 5.5), (2, 1.0), (2, None), (None, 99.0)],
            "k long, v double",
        )
        summary = spark.createDataFrame(
            [(1, 10.5), (2, 2.0), (3, 7.0), (None, 1.0)], "k long, total double"
        )
        got = {
            r.k: (r.n_fact_rows, r.fact_sum, r.diff, r.matched)
            for r in reconcile_sums(fact, summary, "k", "k", "v", "total").collect()
        }
        assert got[1] == (2, Decimal("10.50"), Decimal("0.00"), True)
        # two rows (one NULL value): count counts ROWS, sum skips the NULL
        assert got[2] == (2, Decimal("1.00"), Decimal("-1.00"), False)
        # no fact rows: count 0, NULL sum, unmatched (absence is a finding)
        assert got[3] == (0, None, None, False)
        assert None not in got  # NULL summary keys are dropped

    def test_tolerance_absorbs_rounding(self, spark):
        fact = spark.createDataFrame([(1, 9.99)], "k long, v double")
        summary = spark.createDataFrame([(1, 10.0)], "k long, total double")
        strict = reconcile_sums(fact, summary, "k", "k", "v", "total").collect()[0]
        loose = reconcile_sums(
            fact, summary, "k", "k", "v", "total", tolerance="0.01"
        ).collect()[0]
        assert strict.matched is False and loose.matched is True

    def test_all_null_values_keep_null_sum(self, spark):
        fact = spark.createDataFrame([(1, None)], "k long, v double")
        summary = spark.createDataFrame([(1, 0.0)], "k long, total double")
        r = reconcile_sums(fact, summary, "k", "k", "v", "total").collect()[0]
        assert (r.n_fact_rows, r.fact_sum, r.matched) == (1, None, False)


class TestChangelogCompact:
    def _log(self, spark):
        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (1, t0, 1, "insert", "a"),
            (1, t0 + dt.timedelta(seconds=5), 2, "update", "b"),
            (2, t0, 3, "insert", "x"),
            (2, t0 + dt.timedelta(seconds=1), 4, "delete", None),
            (3, t0, 5, "insert", "z"),
        ]
        return spark.createDataFrame(
            rows, "k long, ts timestamp, seq long, op string, payload string"
        )

    def test_latest_wins_and_deletes_vanish(self, spark):
        out = changelog_compact(
            self._log(spark), ["k"], ["ts", "seq"], op_col="op"
        )
        got = {r.k: r.payload for r in out.collect()}
        assert got == {1: "b", 3: "z"}

    def test_tie_break_by_seq(self, spark):
        t0 = dt.datetime(2026, 1, 1)
        df = spark.createDataFrame(
            [(1, t0, 1, "a"), (1, t0, 2, "b")],
            "k long, ts timestamp, seq long, payload string",
        )
        out = changelog_compact(df, ["k"], ["ts", "seq"]).collect()
        assert [(r.seq, r.payload) for r in out] == [(2, "b")]

    def test_null_order_value_never_wins(self, spark):
        df = spark.createDataFrame(
            [(1, None, "lost"), (1, 5, "kept")], "k long, seq int, payload string"
        )
        assert changelog_compact(df, ["k"], ["seq"]).collect()[0].payload == "kept"

    def test_delete_then_reinsert_survives(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "delete", None), (1, 2, "insert", "back")],
            "k long, seq long, op string, payload string",
        )
        out = changelog_compact(df, ["k"], ["seq"], op_col="op").collect()
        assert [(r.k, r.payload) for r in out] == [(1, "back")]

    def test_single_window_plan(self, spark):
        plan = (
            changelog_compact(self._log(spark), ["k"], ["ts", "seq"], op_col="op")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one shuffle, one real Window; Spark 4 also inserts
        # WindowGroupLimit (partial rank<=1 pushdown before the shuffle —
        # exactly the partial top-1 we want at scale)
        assert plan.count("Exchange") <= 1 and plan.count("Window [") == 1
        assert "WindowGroupLimit" in plan


class TestSurvivorship:
    def _corpus(self, spark):
        df = spark.createDataFrame(
            [
                ("a", "long text here", None),
                ("b", "short", "en"),
                ("c", None, "fr"),
                ("d", "solo", "de"),
            ],
            "doc_id string, text string, lang string",
        )
        clusters = spark.createDataFrame(
            [("a", "a"), ("b", "a"), ("c", "a")], "id string, cluster_id string"
        )
        return df, clusters

    def test_merge_fills_from_lower_ranked(self, spark):
        df, clusters = self._corpus(spark)
        out = survivorship(
            df,
            clusters,
            "doc_id",
            precedence=[F.length("text").desc_nulls_last(), F.col("doc_id").asc()],
            fill_cols=["lang"],
        )
        got = {r.cluster_id: r for r in out.collect()}
        # survivor is 'a' (longest text); its NULL lang fills from 'b' (next
        # by precedence, lang='en' beats 'c' fr)
        assert got["a"].doc_id == "a" and got["a"].text == "long text here"
        assert got["a"].lang == "en" and got["a"].n_members == 3
        # singleton passes through with its own id as cluster
        assert got["d"].doc_id == "d" and got["d"].n_members == 1

    def test_null_ids_dropped_and_precedence_required(self, spark):
        df, clusters = self._corpus(spark)
        withnull = df.union(
            spark.createDataFrame([(None, "x", "en")], df.schema)
        )
        out = survivorship(
            withnull, clusters, "doc_id", precedence=[F.col("doc_id").asc()]
        )
        assert out.filter(F.col("doc_id").isNull()).count() == 0
        with pytest.raises(ValueError):
            survivorship(df, clusters, "doc_id")

    def test_one_shuffle_after_join(self, spark):
        df, clusters = self._corpus(spark)
        plan = (
            survivorship(
                df, clusters, "doc_id", precedence=[F.col("doc_id").asc()]
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Window") == 1
