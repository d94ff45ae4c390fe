"""rollup_report (SQL ROLLUP + grouping_id) and pivot_matrix (pinned
cross-tab): level math on a hand-built corpus, genuine-NULL vs
rolled-up-NULL disambiguation, out-of-pin values, single-aggregate
plan shapes."""

import pytest

from evalidate_spark.operators.olap import pivot_matrix, rollup_report


def _docs(spark, rows):
    return spark.createDataFrame(rows, "lang string, source string, w long")


class TestRollupReport:
    def test_levels_and_grouping_id(self, spark):
        df = _docs(spark, [
            ("en", "a", 10), ("en", "b", 20), ("de", "a", 5)])
        out = {(r.lang, r.source, r.grouping_id): (r.n_rows, r.total_weight)
               for r in rollup_report(df, ["lang", "source"], "w").collect()}
        assert out[("en", "a", 0)] == (1, 10)
        assert out[("en", None, 1)] == (2, 30)     # lang subtotal
        assert out[("de", None, 1)] == (1, 5)
        assert out[(None, None, 3)] == (3, 35)     # grand total
        assert len(out) == 3 + 2 + 1

    def test_genuine_null_dim_vs_rolled_up(self, spark):
        df = _docs(spark, [(None, "a", 7), ("en", "a", 1)])
        out = {(r.lang, r.source, r.grouping_id): r.n_rows
               for r in rollup_report(df, ["lang", "source"], "w").collect()}
        # genuine NULL lang leaf (gid 0) and its subtotal (gid 1) coexist
        assert out[(None, "a", 0)] == 1
        assert out[(None, None, 1)] == 1
        assert out[(None, None, 3)] == 2

    def test_no_weight_col(self, spark):
        df = _docs(spark, [("en", "a", 1)])
        r = rollup_report(df, ["lang"]).collect()
        assert sorted(x.grouping_id for x in r) == [0, 1]
        assert "total_weight" not in r[0].asDict()

    def test_contract(self, spark):
        with pytest.raises(ValueError, match="dims"):
            rollup_report(_docs(spark, [("en", "a", 1)]), [])

    def test_single_expand_single_exchange(self, spark):
        plan = (
            rollup_report(_docs(spark, [("en", "a", 1)]), ["lang", "source"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Expand") == 1
        assert plan.count("Exchange hashpartitioning") == 1


class TestPivotMatrix:
    def test_counts_and_missing_are_null(self, spark):
        df = _docs(spark, [
            ("en", "a", 1), ("en", "a", 1), ("de", "a", 1), ("en", "b", 1)])
        out = {r.source: r for r in pivot_matrix(
            df, "source", "lang", ["de", "en"]).collect()}
        assert (out["a"].de, out["a"].en) == (1, 2)
        assert out["b"].de is None and out["b"].en == 1

    def test_out_of_pin_and_null_count_nowhere(self, spark):
        df = _docs(spark, [("xx", "a", 1), (None, "a", 1)])
        out = pivot_matrix(df, "source", "lang", ["en"]).collect()
        assert len(out) == 1 and out[0].en is None  # row kept, no column

    def test_contracts(self, spark):
        df = _docs(spark, [("en", "a", 1)])
        with pytest.raises(ValueError, match="pinned"):
            pivot_matrix(df, "source", "lang", [])
        with pytest.raises(ValueError, match="unique"):
            pivot_matrix(df, "source", "lang", ["en", "en"])

    def test_one_aggregate_no_distinct_prescan(self, spark):
        plan = (
            pivot_matrix(_docs(spark, [("en", "a", 1)]), "source", "lang",
                         ["de", "en"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


from pyspark.sql import functions as F

from evalidate_spark.operators.table_checks import seasonal_anomalies

_HOUR_S = 3600


def _ev(spark, hour_counts):
    # hour_counts: {hour_index: n_events}; bucket period 4 for tests
    rows = [(h * _HOUR_S * 1_000_000 + i, ) for h, n in hour_counts.items()
            for i in range(n)]
    return spark.createDataFrame(rows, "us long").select(
        F.timestamp_micros("us").alias("ts"))


class TestSeasonalAnomalies:
    def test_same_phase_baseline(self, spark):
        # phases 0..3; phase 0 at hours 0,4,8: counts 10,10,100
        # hour 8 vs others-mean 10 -> 100000 bp spike; hours 0,4 vs
        # mean (10+100)/2=55 -> 1818bp -> drop
        counts = {0: 10, 4: 10, 8: 100}
        for h in range(12):
            counts.setdefault(h, 5)  # steady other phases
        out = {r.bucket_s // _HOUR_S: r for r in seasonal_anomalies(
            _ev(spark, counts), bucket_s=_HOUR_S, period=4,
            spike_bp=8000, drop_bp=5000).collect()}
        assert out[8].phase == 0 and out[8].spike and not out[8].drop
        assert out[8].rate_bp == (10000 * 100 * 2) // 20
        assert out[0].drop and out[4].drop
        assert not out[1].spike and not out[1].drop

    def test_silent_bucket_counts_as_zero(self, spark):
        # hour 2 missing entirely -> densified to 0 events -> drop
        counts = {h: 10 for h in range(8) if h != 2}
        out = {r.bucket_s // _HOUR_S: r for r in seasonal_anomalies(
            _ev(spark, counts), bucket_s=_HOUR_S, period=4).collect()}
        assert out[2].n_events == 0 and out[2].drop

    def test_zero_to_nonzero_spikes_without_ratio(self, spark):
        # phase 1 silent except hour 5 -> others all zero: rate NULL,
        # spike True by the explicit zero->nonzero test
        counts = {h: (7 if h % 4 == 0 else 0) for h in range(12)}
        counts[5] = 3
        out = {r.bucket_s // _HOUR_S: r for r in seasonal_anomalies(
            _ev(spark, counts), bucket_s=_HOUR_S, period=4).collect()}
        assert out[5].rate_bp is None and out[5].spike

    def test_contracts(self, spark):
        df = _ev(spark, {0: 1})
        with pytest.raises(ValueError, match="period"):
            seasonal_anomalies(df, period=1)
        with pytest.raises(ValueError, match="bucket_s"):
            seasonal_anomalies(df, bucket_s=0)


from evalidate_spark.functions.semistructured import json_extract_typed


class TestJsonExtractTyped:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, props string")

    def test_three_state_flag(self, spark):
        df = self._df(spark, [
            (1, '{"k": 7, "tag": "a"}'),
            (2, 'not json'),
            (3, None),
            (4, '{"k": "abc"}'),   # field fails coercion, json still ok
            (5, '{"other": 1}'),   # key absent -> NULL field, json ok
        ])
        out = {r.id: r for r in json_extract_typed(
            df, "props", "k bigint, tag string", keep=["id"]).collect()}
        assert (out[1].k, out[1].tag, out[1].json_ok) == (7, "a", True)
        assert out[2].json_ok is False and out[2].k is None
        assert out[3].json_ok is None
        assert out[4].json_ok is True and out[4].k is None
        assert out[5].json_ok is True and out[5].k is None

    def test_collision_contract(self, spark):
        df = self._df(spark, [(1, "{}")])
        with pytest.raises(ValueError, match="collide"):
            json_extract_typed(df, "props", "id bigint", keep=["id"])

    def test_no_shuffle_plan(self, spark):
        plan = (
            json_extract_typed(self._df(spark, [(1, "{}")]), "props",
                               "k bigint", keep=["id"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
