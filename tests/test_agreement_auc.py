"""verdict_agreement (Cohen's kappa) and ranking_auc (tie-corrected
Mann-Whitney AUC): hand-computed matrices, NULL contracts, degenerate
(constant-rater / one-class) NULL results, a pure-Python O(n^2) pair
replay under hypothesis, and the plan shapes — one single-partition
Exchange for the agreement aggregate, and the AUC window running over
the grouped score table only (no partitionless row-level window)."""

import pytest
from hypothesis import given, settings, strategies as st

from evalidate_spark.functions.classifier import ranking_auc
from evalidate_spark.operators.table_checks import verdict_agreement


def _agree(spark, rows):
    df = spark.createDataFrame(rows, "flag_a boolean, flag_b boolean")
    return verdict_agreement(df).collect()[0]


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "score long, label boolean")
    return ranking_auc(df).collect()[0]


class TestVerdictAgreement:
    def test_hand_matrix(self, spark):
        # a=2, b=1, c=2, d=1, n=6; E=(3)(4)+(3)(2)=18
        # num = 6*3-18 = 0 -> kappa exactly 0 (independence)
        r = _agree(
            spark,
            [(True, True), (True, True), (True, False),
             (False, True), (False, True), (False, False)],
        )
        assert (r.n, r.both_pass, r.only_a, r.only_b, r.both_fail) == (
            6, 2, 1, 2, 1)
        assert r.po_bp == 5000
        assert r.kappa_bp == 0

    def test_perfect_agreement(self, spark):
        r = _agree(spark, [(True, True), (False, False), (True, True)])
        assert r.po_bp == 10000 and r.kappa_bp == 10000

    def test_full_disagreement_negative_kappa(self, spark):
        # a=d=0, b=c=2: E=(2*2)+(2*2)=8, num=0-8=-8, den=16-8=8 -> -10000
        r = _agree(spark, [(True, False), (True, False),
                           (False, True), (False, True)])
        assert r.po_bp == 0 and r.kappa_bp == -10000

    def test_truncation_sign_factored(self, spark):
        # a=1,b=1,c=0,d=1, n=3: E=(2)(1)+(1)(2)=4, num=3*2-4=2, den=9-4=5
        # kappa = 2/5 -> 4000 exactly; po = 2/3 -> 6666 truncated
        r = _agree(spark, [(True, True), (True, False), (False, False)])
        assert r.po_bp == 6666
        assert r.kappa_bp == 4000

    def test_null_flags_count_as_fail(self, spark):
        r = _agree(spark, [(None, True), (True, None), (None, None)])
        assert (r.both_pass, r.only_a, r.only_b, r.both_fail) == (0, 1, 1, 1)

    def test_one_constant_rater_kappa_zero(self, spark):
        # rater A always true: pe = po, kappa exactly 0 (no skill beyond
        # the marginals), still defined
        r = _agree(spark, [(True, True), (True, False)])
        assert r.kappa_bp == 0 and r.po_bp == 5000

    def test_both_constant_kappa_null(self, spark):
        # pe = 1 -> den = 0, kappa undefined
        r = _agree(spark, [(True, True), (True, True)])
        assert r.kappa_bp is None and r.po_bp == 10000

    def test_empty_input(self, spark):
        r = _agree(spark, [])
        assert r.n == 0 and r.po_bp is None and r.kappa_bp is None

    def test_single_exchange_plan(self, spark):
        df = spark.range(100).selectExpr(
            "id % 2 = 0 AS flag_a", "id % 3 = 0 AS flag_b")
        plan = verdict_agreement(df)._jdf.queryExecution().executedPlan().toString()
        # partial+final agg: exactly one Exchange, and it moves counter
        # rows to a single partition — never data
        assert plan.count("Exchange") == 1
        assert "SinglePartition" in plan


def _auc_pairs(scored):
    """O(n^2) literal pair count: wins + half-ties over pos x neg."""
    pos = [s for s, l in scored if l]
    neg = [s for s, l in scored if not l]
    if not pos or not neg:
        return None
    num2 = sum((2 if p > n else (1 if p == n else 0))
               for p in pos for n in neg)
    return (10000 * num2) // (2 * len(pos) * len(neg))


class TestRankingAuc:
    def test_perfect_separation(self, spark):
        r = _auc(spark, [(1, False), (2, False), (3, True), (4, True)])
        assert r.auc_bp == 10000 and r.n_scores == 4

    def test_reversed(self, spark):
        r = _auc(spark, [(9, False), (1, True)])
        assert r.auc_bp == 0

    def test_all_tied(self, spark):
        r = _auc(spark, [(5, False), (5, True), (5, False), (5, True)])
        assert r.auc_bp == 5000 and r.n_scores == 1

    def test_tie_half_credit(self, spark):
        # pos@1 ties neg@1 (0.5), pos@2 beats neg@1 (1) -> 1.5/2 = 7500
        r = _auc(spark, [(1, False), (1, True), (2, True)])
        assert r.auc_bp == 7500

    def test_null_score_and_label_excluded(self, spark):
        r = _auc(spark, [(1, False), (2, True), (None, True), (3, None)])
        assert r.n == 2 and r.auc_bp == 10000

    def test_one_class_null_auc(self, spark):
        r = _auc(spark, [(1, True), (2, True)])
        assert r.n_pos == 2 and r.n_neg == 0 and r.auc_bp is None

    def test_empty(self, spark):
        r = _auc(spark, [])
        assert r.n == 0 and r.auc_bp is None

    @settings(max_examples=10, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(-50, 50), st.booleans()),
        min_size=1, max_size=60,
    ))
    def test_matches_literal_pair_count(self, spark, scored):
        r = _auc(spark, scored)
        assert r.auc_bp == _auc_pairs(scored)

    def test_window_runs_on_grouped_table(self, spark):
        df = spark.range(1000).selectExpr(
            "cast(id % 7 as long) AS score", "id % 2 = 0 AS label")
        plan = ranking_auc(df)._jdf.queryExecution().executedPlan().toString()
        # the ordered window must sit ABOVE a hash aggregate on the score
        # (rank statistics from group counts): plans print top-down, so a
        # HashAggregate must appear BELOW (after) the Window node
        win_ix = plan.find("Window")
        assert win_ix != -1
        assert "HashAggregate" in plan[win_ix:]
