"""Unit tests for the declarative row-level constraint surface
(check_expressions / expression_violations), the null/MI/Benford column
diagnostics, and per-entity sequence_anomalies."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from evalidate_spark.operators.sessions import sequence_anomalies
from evalidate_spark.operators.table_checks import (
    benford,
    check_expressions,
    expression_violations,
    mutual_information,
    null_correlation,
)


class TestCheckExpressions:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 10.0, "A"), (2, 60.0, "A"), (3, None, "B"), (4, 5.0, None)],
            "id long, qty double, flag string",
        )

    def test_summary_counts_and_null_fails(self, spark):
        rows = {
            r["check_id"]: r
            for r in check_expressions(
                self._df(spark),
                {
                    "qty_le_50": "qty <= 50",  # row2 fails, row3 NULL fails
                    "flag_a": "flag = 'A'",  # row3 fails, row4 NULL fails
                    "id_pos": "id > 0",  # all pass
                },
            ).collect()
        }
        assert rows["qty_le_50"]["n_failed"] == 2
        assert rows["flag_a"]["n_failed"] == 2
        assert rows["id_pos"]["n_failed"] == 0
        assert rows["id_pos"]["status"] == "pass"
        assert rows["qty_le_50"]["status"] == "fail"
        assert rows["qty_le_50"]["pass_bp"] == 5000  # 2/4 pass
        assert all(r["n_rows"] == 4 for r in rows.values())

    def test_empty_table_vacuous_pass(self, spark):
        df = self._df(spark).filter("id < 0")
        [r] = check_expressions(df, {"c": "qty > 0"}).collect()
        assert (r["n_rows"], r["n_failed"], r["pass_bp"], r["status"]) == (
            0, 0, 10000, "pass",
        )

    def test_cross_column_predicate(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (3.0, 2.0)], "a double, b double"
        )
        [r] = check_expressions(df, {"a_le_b": "a <= b"}).collect()
        assert r["n_failed"] == 1

    def test_empty_checks_raises(self, spark):
        with pytest.raises(ValueError):
            check_expressions(self._df(spark), {})

    def test_single_exchange_plan(self, spark):
        # k checks = k conditional sums in ONE aggregate over one scan:
        # the only exchange is the final single-partition merge
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("m")
        )
        plan = check_expressions(
            df, {"a": "m < 5", "b": "id >= 0", "c": "m != 3"}
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "hashpartitioning" not in plan

    def test_violation_rows(self, spark):
        got = sorted(
            (r["check_id"], r["id"])
            for r in expression_violations(
                self._df(spark),
                {"qty_le_50": "qty <= 50", "flag_a": "flag = 'A'"},
                ["id"],
            ).collect()
        )
        assert got == [
            ("flag_a", 3), ("flag_a", 4), ("qty_le_50", 2), ("qty_le_50", 3),
        ]

    def test_violation_id_col_with_dot(self, spark):
        # a literal dotted column name must not parse as struct access
        df = spark.createDataFrame([(1, 0.0)], "`meta.id` long, v double")
        got = expression_violations(
            df, {"v_pos": "v > 0"}, ["meta.id"]
        ).collect()
        assert [(r["check_id"], r["meta.id"]) for r in got] == [("v_pos", 1)]

    def test_violations_empty_when_all_pass(self, spark):
        assert (
            expression_violations(
                self._df(spark), {"ok": "id > 0"}, ["id"]
            ).count()
            == 0
        )


class TestNullCorrelation:
    def test_shared_failure_path(self, spark):
        # rows 3-4: a and b null TOGETHER; row 5: only b null
        df = spark.createDataFrame(
            [
                ("x", "y", 1), ("x", "y", 2),
                (None, None, 3), (None, None, 4), ("x", None, 5),
            ],
            "a string, b string, c int",
        )
        rows = {
            (r["col_a"], r["col_b"]): r
            for r in null_correlation(df, ["a", "b", "c"]).collect()
        }
        ab = rows[("a", "b")]
        assert (ab["a_null"], ab["b_null"], ab["both_null"]) == (2, 3, 2)
        assert ab["jaccard_bp"] == 10000 * 2 // 3
        ac = rows[("a", "c")]
        assert ac["both_null"] == 0 and ac["jaccard_bp"] == 0
        bc = rows[("b", "c")]
        assert bc["jaccard_bp"] == 0
        assert all(r["n"] == 5 for r in rows.values())

    def test_no_nulls_is_null_jaccard(self, spark):
        df = spark.createDataFrame([("x", "y")], "a string, b string")
        [r] = null_correlation(df, ["a", "b"]).collect()
        assert r["jaccard_bp"] is None

    def test_errors(self, spark):
        df = spark.createDataFrame([("x",)], "a string")
        with pytest.raises(ValueError):
            null_correlation(df, ["a"])
        with pytest.raises(ValueError):
            null_correlation(df, ["a", "nope"])


class TestMutualInformation:
    def test_perfect_dependence_and_independence(self, spark):
        # y = x parity (bijective on {0,1}): MI == H(y) == 1 bit.
        # z alternates independently of x: MI(x, z) == 0.
        rows = [(i % 2, i % 2, (i // 2) % 2) for i in range(16)]
        df = spark.createDataFrame(rows, "x int, y int, z int")
        got = {
            (r["col_x"], r["col_y"]): r
            for r in mutual_information(df, [("x", "y"), ("x", "z")]).collect()
        }
        dep = got[("x", "y")]
        assert dep["mi_bits"] == pytest.approx(1.0, abs=1e-6)
        assert dep["h_xy_bits"] == pytest.approx(1.0, abs=1e-6)
        ind = got[("x", "z")]
        assert ind["mi_bits"] == pytest.approx(0.0, abs=1e-6)
        assert ind["h_xy_bits"] == pytest.approx(2.0, abs=1e-6)

    def test_self_pair_equals_entropy(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), ("b",), (None,)], "c string"
        )
        [r] = mutual_information(df, [("c", "c")]).collect()
        want = -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25))
        assert r["mi_bits"] == pytest.approx(want, abs=1e-6)
        assert r["h_x_bits"] == r["h_y_bits"] == r["mi_bits"]
        assert r["n"] == 4  # NULL is its own category

    def test_empty_pairs_raises(self, spark):
        df = spark.createDataFrame([("a",)], "c string")
        with pytest.raises(ValueError):
            mutual_information(df, [])


class TestBenford:
    def test_digit_extraction_and_shape(self, spark):
        # scale=2: 1.23→123(d1), 0.045→5(d5, rounds 4.5 up), -20→2000(d2),
        # 0→excluded, NULL→excluded, 9000.0→d9
        df = spark.createDataFrame(
            [(1.23,), (0.045,), (-20.0,), (0.0,), (None,), (9000.0,)],
            "v double",
        )
        rows = benford(df, ["v"], scale=2).collect()
        assert len(rows) == 9  # all digits always present
        by_digit = {r["digit"]: r for r in rows}
        assert by_digit[1]["n"] == 1
        assert by_digit[2]["n"] == 1
        assert by_digit[5]["n"] == 1
        assert by_digit[9]["n"] == 1
        assert sum(r["n"] for r in rows) == 4
        assert by_digit[1]["share_bp"] == 2500
        assert by_digit[3]["n"] == 0 and by_digit[3]["share_bp"] == 0
        assert by_digit[1]["expected_bp"] == 3010
        assert by_digit[9]["expected_bp"] == 457

    def test_empty_column_zero_shares(self, spark):
        df = spark.createDataFrame([(0.0,), (None,)], "v double")
        rows = benford(df, ["v"]).collect()
        assert all(r["n"] == 0 and r["share_bp"] == 0 for r in rows)

    def test_expected_bp_matches_log_formula(self, spark):
        from evalidate_spark.operators.table_checks import BENFORD_EXPECTED_BP

        for d in range(1, 10):
            assert BENFORD_EXPECTED_BP[d - 1] == int(
                math.floor(math.log10(1 + 1 / d) * 10000)
            )

    def test_unknown_column_raises(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            benford(df, ["nope"])


class TestSequenceAnomalies:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts_s string"
        ).select(
            "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    def test_kinds_and_measures(self, spark):
        df = self._df(
            spark,
            [
                (1, 1, "2026-01-01 10:00:00"),
                (1, 2, "2026-01-01 10:00:30"),
                (1, 2, "2026-01-01 10:01:00"),  # duplicate_seq (30 s after)
                (1, 3, "2026-01-01 09:59:00"),  # ts_regression (2 min back)
                (1, 4, "2026-01-01 12:00:00"),  # gap (> 1 h)
                (2, 1, "2026-01-01 10:00:00"),  # lone first event: no anomaly
            ],
        )
        got = sorted(
            (r["entity"], r["seq"], r["kind"], r["measure"])
            for r in sequence_anomalies(
                df, max_gap_us=3600 * 1_000_000
            ).collect()
        )
        assert got == [
            (1, 2, "duplicate_seq", 30_000_000),
            (1, 3, "ts_regression", 120_000_000),
            (1, 4, "gap", (2 * 3600 + 60) * 1_000_000),
        ]

    def test_no_gap_check_without_threshold(self, spark):
        df = self._df(
            spark,
            [(1, 1, "2026-01-01 00:00:00"), (1, 2, "2026-12-31 00:00:00")],
        )
        assert sequence_anomalies(df).count() == 0

    def test_null_fields_excluded(self, spark):
        df = self._df(
            spark,
            [
                (1, 1, "2026-01-01 10:00:00"),
                (None, 2, "2026-01-01 09:00:00"),  # NULL entity
                (1, None, "2026-01-01 09:00:00"),  # NULL seq
                (1, 2, None),  # NULL ts
                (1, 3, "2026-01-01 10:30:00"),
            ],
        )
        # the surviving sequence is 1→3, forward in time, no gap check
        assert sequence_anomalies(df).count() == 0

    def test_single_window_plan(self, spark):
        df = self._df(spark, [(1, 1, "2026-01-01 10:00:00")])
        plan = (
            sequence_anomalies(df, max_gap_us=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert plan.count("Window") == 1


class TestHotkeyStates:
    def test_merge_equals_whole_sketch_and_truth(self, spark):
        from evalidate_spark.operators.table_checks import (
            hotkey_state,
            merge_hotkey_states,
        )

        vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5 + [None] * 3
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, k string"
        )
        whole = hotkey_state(df, ["k"], "all")
        split = hotkey_state(df.filter("i % 2 = 0"), ["k"], "u0").unionByName(
            hotkey_state(df.filter("i % 2 = 1"), ["k"], "u1")
        )
        got_whole = {
            r["key"]: (r["est_count"], r["n_values"], r["share_bp"])
            for r in merge_hotkey_states(spark, whole, top_k=4).collect()
        }
        got_split = {
            r["key"]: (r["est_count"], r["n_values"], r["share_bp"])
            for r in merge_hotkey_states(spark, split, top_k=4).collect()
        }
        # fold of increments ≡ whole-data sketch ≡ exact truth here
        assert got_whole == got_split
        assert got_whole["a"] == (50, 100, 5000)
        assert got_whole["d"] == (5, 100, 500)
        assert None not in got_whole and len(got_whole) == 4

    def test_errors(self, spark):
        from evalidate_spark.operators.table_checks import (
            hotkey_state,
            merge_hotkey_states,
        )

        df = spark.createDataFrame([("a",)], "k string")
        with pytest.raises(ValueError):
            hotkey_state(df, [], "u0")
        with pytest.raises(ValueError):
            hotkey_state(df, ["nope"], "u0")
        with pytest.raises(ValueError):
            merge_hotkey_states(spark, hotkey_state(df, ["k"], "u").limit(0))


class TestUniquenessStates:
    def test_exact_below_retention_and_errors(self, spark):
        from evalidate_spark.operators.table_checks import (
            merge_uniqueness_states,
            uniqueness_state,
        )

        a = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y"), (None, "z")], "k long, s string"
        )
        b = spark.createDataFrame(
            [(3, "x"), (4, None), (5, "y")], "k long, s string"
        )
        states = uniqueness_state(a, ["k", "s"], "u0").unionByName(
            uniqueness_state(b, ["k", "s"], "u1")
        )
        got = {r["column"]: r for r in merge_uniqueness_states(states).collect()}
        # k: unit distinct 3 + 3, union {1..5} = 5 -> 1 repeat (key 3);
        # NULLs don't count
        assert (got["k"]["sum_unit_distinct"], got["k"]["union_distinct"]) == (6, 5)
        assert got["k"]["cross_unit_keys"] == 1
        assert got["k"]["n_values"] == 6
        # s: {x,y,z} + {x,y} union {x,y,z} -> 2 repeats
        assert got["s"]["cross_unit_keys"] == 2
        with pytest.raises(ValueError):
            uniqueness_state(a, [], "u0")
        with pytest.raises(ValueError):
            uniqueness_state(a, ["nope"], "u0")
