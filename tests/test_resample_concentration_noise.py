"""resample_locf (LOCF grid resampling), concentration_profile
(Gini/HHI/top-share in exact integer bp), and knn_label_agreement
(k-NN label-noise flags): hand-built grids with gaps and within-bucket
ties, known-inequality distributions (uniform -> gini 0, monopoly-ish),
a planted mislabeled point among clusterable vectors, NULL contracts,
and the reduced-cardinality plan shapes."""

import pytest
from pyspark.sql import functions as F

from evalidate_spark.functions.similarity import knn_label_agreement
from evalidate_spark.operators.sessions import resample_locf
from evalidate_spark.operators.table_checks import concentration_profile

_US = 1_000_000
_HOUR = 3600 * _US


def _ev(spark, rows):
    # (user, ts_us_as_long, value, eid) pre-bucketable integer micros
    return spark.createDataFrame(
        rows, "u long, ts_us long, v double, eid long"
    ).select(
        "u", F.timestamp_micros("ts_us").alias("ts"), "v", "eid"
    )


class TestResampleLocf:
    def test_carry_forward_and_grid_extent(self, spark):
        # user 1 observes at hour 0 and hour 3; user 2 at hour 1 only;
        # global max bucket = 3 -> user 2's grid runs 1..3 all carried
        rows = [
            (1, 0 * _HOUR, 1.0, 1),
            (1, 3 * _HOUR, 4.0, 2),
            (2, 1 * _HOUR + 5, 9.0, 3),
        ]
        out = sorted(
            resample_locf(
                _ev(spark, rows), ["u"], "ts", ["v"],
                step_s=3600, tiebreak_cols=["eid"],
            ).collect(),
            key=lambda r: (r.u, r.bucket_start_us),
        )
        got = [(r.u, r.bucket_start_us // _HOUR, r.v, r.carried) for r in out]
        assert got == [
            (1, 0, 1.0, False), (1, 1, 1.0, True), (1, 2, 1.0, True),
            (1, 3, 4.0, False),
            (2, 1, 9.0, False), (2, 2, 9.0, True), (2, 3, 9.0, True),
        ]

    def test_within_bucket_latest_wins_ties_on_tiebreak(self, spark):
        rows = [
            (1, 10, 1.0, 1), (1, 20, 2.0, 2),   # later ts wins
            (2, 10, 5.0, 9), (2, 10, 7.0, 3),   # same ts: higher eid wins
        ]
        out = {r.u: r.v for r in resample_locf(
            _ev(spark, rows), ["u"], "ts", ["v"],
            step_s=3600, tiebreak_cols=["eid"]).collect()}
        assert out == {1: 2.0, 2: 5.0}

    def test_null_value_carries_as_null(self, spark):
        rows = [(1, 0, None, 1), (1, 2 * _HOUR, 3.0, 2)]
        out = sorted(
            resample_locf(_ev(spark, rows), ["u"], "ts", ["v"],
                          step_s=3600, tiebreak_cols=["eid"]).collect(),
            key=lambda r: r.bucket_start_us,
        )
        assert [r.v for r in out] == [None, None, 3.0]

    def test_null_key_or_ts_dropped(self, spark):
        df = spark.createDataFrame(
            [(None, 0, 1.0, 1), (1, None, 2.0, 2), (1, 0, 3.0, 3)],
            "u long, ts_us long, v double, eid long",
        ).select("u", F.timestamp_micros("ts_us").alias("ts"), "v", "eid")
        out = resample_locf(df, ["u"], "ts", ["v"], step_s=3600,
                            tiebreak_cols=["eid"]).collect()
        assert [(r.u, r.v) for r in out] == [(1, 3.0)]

    def test_contracts(self, spark):
        df = _ev(spark, [(1, 0, 1.0, 1)])
        with pytest.raises(ValueError, match="key_cols"):
            resample_locf(df, [], "ts", ["v"])
        with pytest.raises(ValueError, match="value_cols"):
            resample_locf(df, ["u"], "ts", [])
        with pytest.raises(ValueError, match="step_s"):
            resample_locf(df, ["u"], "ts", ["v"], step_s=0)

    def test_explode_is_grid_cardinality_not_events_x_grid(self, spark):
        # 3 observations -> 4-bucket grid: output rows == grid rows
        rows = [(1, 0, 1.0, 1), (1, 1 * _HOUR, 2.0, 2), (1, 3 * _HOUR, 3.0, 3)]
        out = resample_locf(_ev(spark, rows), ["u"], "ts", ["v"],
                            step_s=3600, tiebreak_cols=["eid"])
        assert out.count() == 4


class TestConcentrationProfile:
    def _prof(self, spark, pairs):
        df = spark.createDataFrame(pairs, "g string, w long")
        return concentration_profile(df, "g", "w").collect()[0]

    def test_uniform_is_zero_gini(self, spark):
        r = self._prof(spark, [("a", 10), ("b", 10), ("c", 10), ("d", 10)])
        assert (r.n_groups, r.total_weight) == (4, 40)
        assert r.gini_bp == 0
        assert r.top_share_bp == 2500
        assert r.hhi_bp == 2500  # 4 * (1/4)^2

    def test_concentrated(self, spark):
        # weights 1,1,1,97: near-monopoly
        r = self._prof(spark, [("a", 1), ("b", 1), ("c", 1), ("d", 97)])
        assert r.top_share_bp == 9700
        # HHI = (3*1 + 97^2)/100^2 = 9412/10000
        assert r.hhi_bp == 9412
        # gini = (2*(1*1+2*1+3*1+4*97) - 5*100) / (4*100) = (788-500)/400
        assert r.gini_bp == 7200

    def test_null_and_nonpositive_excluded(self, spark):
        r = self._prof(
            spark,
            [("a", 10), ("b", 10), (None, 50), ("c", None), ("d", 0),
             ("e", -5)],
        )
        assert (r.n_groups, r.total_weight, r.gini_bp) == (2, 20, 0)

    def test_single_group_monopoly(self, spark):
        r = self._prof(spark, [("a", 7)])
        assert (r.top_share_bp, r.hhi_bp, r.gini_bp) == (10000, 10000, 0)

    def test_multirow_groups_summed(self, spark):
        r = self._prof(spark, [("a", 5), ("a", 5), ("b", 10)])
        assert (r.n_groups, r.total_weight, r.gini_bp) == (2, 20, 0)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


class TestKnnLabelAgreement:
    def test_planted_mislabel_flagged(self, spark):
        # two tight clusters on axes 0 and 1; vec 10 sits in cluster A
        # but carries cluster B's label
        a = [1.0, 0.0, 0.0]
        b = [0.0, 1.0, 0.0]
        rows = (
            [(i, [x + 0.001 * i for x in a], 0) for i in range(4)]
            + [(10, [x + 0.005 for x in a], 1)]
            + [(20 + i, [x + 0.001 * i for x in b], 1) for i in range(4)]
        )
        out = {r.vec_id: r for r in knn_label_agreement(
            _emb(spark, rows), k=3).collect()}
        assert out[10].suspect and out[10].n_agree == 0
        assert not out[0].suspect and out[0].agree_bp == 10000
        assert not out[20].suspect

    def test_self_excluded_even_among_duplicates(self, spark):
        v = [1.0, 0.0]
        rows = [(1, v, 0), (2, v, 0), (3, v, 1)]
        out = {r.vec_id: r for r in knn_label_agreement(
            _emb(spark, rows), k=2).collect()}
        # every point sees the other two, never itself
        assert all(r.n_neighbors == 2 for r in out.values())
        assert out[3].n_agree == 0 and out[3].suspect

    def test_null_label_neither_scored_nor_votes(self, spark):
        rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.1], 0),
                (3, [1.0, 0.05], None)]
        out = knn_label_agreement(_emb(spark, rows), k=5).collect()
        ids = sorted(r.vec_id for r in out)
        assert ids == [1, 2]
        assert all(r.n_neighbors == 1 and r.n_agree == 1 for r in out)

    def test_ragged_and_null_vectors_absent(self, spark):
        rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.1], 0),
                (3, [1.0], 1), (4, None, 1)]
        out = knn_label_agreement(_emb(spark, rows), k=3).collect()
        assert sorted(r.vec_id for r in out) == [1, 2]

    def test_precomputed_neighbors_path(self, spark):
        rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.1], 0), (3, [0.0, 1.0], 1)]
        nbrs = spark.createDataFrame(
            [(1, 2, 0.995), (2, 1, 0.995), (3, 2, 0.1)],
            "query_id long, neighbor_id long, cosine double",
        )
        out = {r.vec_id: r for r in knn_label_agreement(
            _emb(spark, rows), k=1, neighbors=nbrs).collect()}
        assert out[1].n_agree == 1 and out[3].n_agree == 0

    def test_contract(self, spark):
        with pytest.raises(ValueError, match="k must"):
            knn_label_agreement(_emb(spark, [(1, [1.0], 0)]), k=0)


from evalidate_spark.operators.behavior import transition_matrix


def _tev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_us long, event_type string, event_id long"
    ).select(
        "user_id", F.timestamp_micros("ts_us").alias("ts"),
        "event_type", "event_id",
    )


class TestTransitionMatrix:
    def test_counts_and_conditional_bp(self, spark):
        rows = [
            (1, 10, "a", 1), (1, 20, "b", 2), (1, 30, "a", 3),
            (1, 40, "b", 4),
            (2, 10, "a", 5), (2, 20, "a", 6),
        ]
        out = {(r.prev_type, r.next_type): r for r in transition_matrix(
            _tev(spark, rows), tiebreak_cols=["event_id"]).collect()}
        # from 'a': 2×a→b, 1×a→a -> p(a→b)=6666bp, p(a→a)=3333bp
        assert out[("a", "b")].n == 2 and out[("a", "b")].p_bp == 6666
        assert out[("a", "a")].n == 1 and out[("a", "a")].p_bp == 3333
        assert out[("b", "a")].n == 1 and out[("b", "a")].p_bp == 10000

    def test_null_state_breaks_adjacency(self, spark):
        rows = [(1, 10, "a", 1), (1, 20, None, 2), (1, 30, "b", 3)]
        out = transition_matrix(
            _tev(spark, rows), tiebreak_cols=["event_id"]).collect()
        assert out == []  # a and b are NOT adjacent across the NULL

    def test_same_ts_tiebreak(self, spark):
        rows = [(1, 10, "b", 2), (1, 10, "a", 1)]  # order by (ts, id): a→b
        out = transition_matrix(
            _tev(spark, rows), tiebreak_cols=["event_id"]).collect()
        assert [(r.prev_type, r.next_type, r.n) for r in out] == [
            ("a", "b", 1)]

    def test_rare_flag(self, spark):
        rows = [(u, i * 10, ("x" if i == 1 and u == 0 else "y"), u * 1000 + i)
                for u in range(10) for i in range(12)]
        out = {(r.prev_type, r.next_type): r for r in transition_matrix(
            _tev(spark, rows), tiebreak_cols=["event_id"],
            rare_below_bp=200).collect()}
        # y→x happens once among 100+ y→* transitions -> rare
        assert out[("y", "x")].rare
        assert not out[("y", "y")].rare

    def test_null_user_or_ts_excluded(self, spark):
        rows = [(None, 10, "a", 1), (None, 20, "b", 2),
                (1, None, "a", 3), (1, 10, "a", 4), (1, 20, "b", 5)]
        out = transition_matrix(
            _tev(spark, rows), tiebreak_cols=["event_id"]).collect()
        assert [(r.prev_type, r.next_type, r.n) for r in out] == [
            ("a", "b", 1)]


from evalidate_spark.functions.dedup import pair_graph_degrees


class TestPairGraphDegrees:
    def test_degrees_dedupe_repeated_pairs(self, spark):
        # pair (1,2) surfaces twice (two LSH bands) -> degree counts once
        df = spark.createDataFrame(
            [(1, 2), (1, 2), (2, 3), (1, 3)], "id_a long, id_b long")
        out = {r.id: (r.degree, r.hub) for r in
               pair_graph_degrees(df, hub_min_degree=2).collect()}
        assert out == {1: (2, True), 2: (2, True), 3: (2, True)}

    def test_hub_detection(self, spark):
        df = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "id_a long, id_b long")
        out = {r.id: r for r in
               pair_graph_degrees(df, hub_min_degree=5).collect()}
        assert out[0].degree == 5 and out[0].hub
        assert all(not out[i].hub and out[i].degree == 1
                   for i in range(1, 6))

    def test_null_and_self_pairs_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 1), (None, 2), (3, None), (1, 2)], "id_a long, id_b long")
        out = sorted((r.id, r.degree) for r in
                     pair_graph_degrees(df).collect())
        assert out == [(1, 1), (2, 1)]

    def test_single_exchange_plan(self, spark):
        df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        plan = (
            pair_graph_degrees(df)._jdf.queryExecution()
            .executedPlan().toString()
        )
        # distinct + count ride one hashpartitioning on the node id
        assert plan.count("Exchange hashpartitioning") <= 2


from evalidate_spark.operators.table_checks import l_diversity


class TestLDiversity:
    def test_undiverse_group_flagged(self, spark):
        # type 'x': 3 rows all user 1 -> 1 distinct < 2; 'y': users 1,2
        df = spark.createDataFrame(
            [("x", 1), ("x", 1), ("x", 1), ("y", 1), ("y", 2)],
            "t string, u long",
        )
        r = l_diversity(df, ["t"], "u", l=2).collect()[0]
        assert (r.n_groups, r.min_distinct_sensitive) == (2, 1)
        assert (r.n_undiverse_groups, r.n_rows_at_risk) == (1, 3)
        assert not r.l_diverse

    def test_null_sensitive_does_not_count(self, spark):
        # group 'x' has users {1, NULL}: only 1 disclosed value
        df = spark.createDataFrame(
            [("x", 1), ("x", None)], "t string, u long")
        r = l_diversity(df, ["t"], "u", l=2).collect()[0]
        assert r.min_distinct_sensitive == 1 and not r.l_diverse

    def test_null_quasi_forms_visible_group(self, spark):
        df = spark.createDataFrame(
            [(None, 1), (None, 2), ("x", 1), ("x", 2)], "t string, u long")
        r = l_diversity(df, ["t"], "u", l=2).collect()[0]
        assert r.n_groups == 2 and r.l_diverse

    def test_contracts(self, spark):
        df = spark.createDataFrame([("x", 1)], "t string, u long")
        with pytest.raises(ValueError, match="quasi"):
            l_diversity(df, [], "u")
        with pytest.raises(ValueError, match="l must"):
            l_diversity(df, ["t"], "u", l=1)


from evalidate_spark.functions.similarity import cosine_topk, cosine_topk_blas


class TestCosineTopkBlas:
    def test_bit_identical_to_fold_variant(self, spark):
        import random

        rng = random.Random(7)
        emb = _emb(spark, [
            (i, [rng.uniform(-1, 1) for _ in range(16)], i % 3)
            for i in range(60)
        ] + [(100, [0.0] * 16, 0), (101, [0.0] * 16, 1),  # zero-norm pair
             (102, [1.0] * 5, 2)])                        # ragged
        probes = emb.select(
            F.col("vec_id").alias("query_id"), "embedding"
        ).filter(F.col("query_id") % 7 == 0)
        a = sorted(map(tuple, cosine_topk(emb, probes, k=4).collect()))
        b = sorted(map(tuple, cosine_topk_blas(emb, probes, k=4).collect()))
        assert a == b

    def test_zero_vector_scores_zero(self, spark):
        emb = _emb(spark, [(1, [0.0, 0.0], 0), (2, [1.0, 0.0], 1)])
        probes = emb.select(F.col("vec_id").alias("query_id"), "embedding")
        out = {(r.query_id, r.neighbor_id): r.cosine
               for r in cosine_topk_blas(emb, probes, k=2).collect()}
        assert out[(1, 2)] == 0.0 and out[(2, 1)] == 0.0
