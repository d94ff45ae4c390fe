"""A-priori co-occurring token pairs: hand-computed supports, downward-
closure prune, per-doc cap determinism, tie-break order, NULL contracts."""

from evalidate_spark.functions.text import cooccurring_pairs

SCHEMA = "doc_id long, text string"

ROWS = [
    (1, "red apple pie with Red cherry"),   # distinct: red apple pie with cherry
    (2, "apple pie and cherry tart"),
    (3, "apple pie again apple"),           # dup token counted once
    (4, "cherry pie forever"),
    (5, None),                              # NULL text excluded
    (None, "apple pie"),                    # NULL id excluded
    (6, ""),                                # empty text -> no tokens
    (7, "apple  pie"),                      # double space -> no empty token
]


def _rows(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return [
        (r.t_a, r.t_b, r.n_docs)
        for r in cooccurring_pairs(df, **kw).collect()
    ]


class TestCooccurringPairs:
    def test_hand_computed_supports(self, spark):
        got = _rows(spark, ROWS, min_support=2, top_k=10)
        # apple+pie: docs 1,2,3,7 = 4; cherry+pie: 1,2,4 = 3; apple+cherry: 1,2
        assert got == [
            ("apple", "pie", 4),
            ("cherry", "pie", 3),
            ("apple", "cherry", 2),
        ]

    def test_downward_closure_prunes_rare_tokens(self, spark):
        # "tart" appears once -> pruned in pass 1, so no pair contains it
        got = _rows(spark, ROWS, min_support=2, top_k=100)
        assert all("tart" not in (a, b) for a, b, _ in got)

    def test_pair_support_threshold(self, spark):
        got = _rows(spark, ROWS, min_support=4, top_k=10)
        assert got == [("apple", "pie", 4)]

    def test_tie_break_is_lexicographic(self, spark):
        rows = [(i, "zeta beta alpha") for i in range(3)]
        got = _rows(spark, rows, min_support=3, top_k=2)
        # all three pairs have support 3; lexicographic order cuts at 2
        assert got == [("alpha", "beta", 3), ("alpha", "zeta", 3)]

    def test_cap_bounds_pairs_per_doc(self, spark):
        # 10 shared tokens, cap 4 -> only first 4 alphabetical pair up
        toks = " ".join("t%02d" % i for i in range(10))
        rows = [(i, toks) for i in range(3)]
        got = _rows(spark, rows, min_support=3, top_k=100, max_tokens_per_doc=4)
        assert len(got) == 6  # C(4,2)
        assert all(a <= "t03" and b <= "t03" for a, b, _ in got)

    def test_plan_no_cartesian(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        plan = (
            cooccurring_pairs(df, min_support=2, top_k=10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestAssociationRules:
    ROWS = [
        (1, "red apple pie with red cherry"),
        (2, "apple pie and cherry tart"),
        (3, "apple pie again apple"),
        (4, "cherry pie forever"),
    ]

    def _rules(self, spark, **kw):
        from evalidate_spark.functions.text import association_rules

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        return {
            (r.ante, r.cons): (r.n_pair, r.n_ante, r.conf_bp, r.lift_gt1)
            for r in association_rules(df, **kw).collect()
        }

    def test_confidence_exact_integer(self, spark):
        got = self._rules(spark, min_support=2, min_conf_bp=1, top_k=20)
        # apple in 3 docs, pie in 4; apple+pie in 3
        assert got[("apple", "pie")] == (3, 3, 10000, False)  # lift == 1
        assert got[("pie", "apple")] == (3, 4, 7500, False)
        # apple+cherry 2; lift = 4*2 / (3*3) < 1
        assert got[("apple", "cherry")] == (2, 3, 6666, False)

    def test_lift_flag_fires(self, spark):
        rows = self.ROWS + [(5, "zzz yyy"), (6, "zzz yyy"), (7, "unrelated word")]
        from evalidate_spark.functions.text import association_rules

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.ante, r.cons): r.lift_gt1
            for r in association_rules(df, min_support=2, min_conf_bp=1).collect()
        }
        # zzz,yyy co-occur always and nowhere else: N*n=7*2 > 2*2 -> lift>1
        assert got[("zzz", "yyy")] is True and got[("yyy", "zzz")] is True

    def test_min_conf_filters(self, spark):
        got = self._rules(spark, min_support=2, min_conf_bp=8000, top_k=20)
        assert set(got) == {("apple", "pie"), ("cherry", "pie")}

    def test_top_k_order(self, spark):
        from evalidate_spark.functions.text import association_rules

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        rows = association_rules(df, min_support=2, min_conf_bp=1, top_k=3).collect()
        key = [(r.conf_bp, r.ante, r.cons) for r in rows]
        assert key == sorted(key, key=lambda k: (-k[0], k[1], k[2]))
        assert len(rows) == 3
