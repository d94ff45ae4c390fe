"""Fuzzy entity resolution: normalization, blocking recall/containment,
edit-distance boundary, deterministic hot-block cap, and NULL contracts."""

from pyspark.sql import functions as F

from evalidate_spark.functions.dedup import fuzzy_matches

SCHEMA = "id long, name string"


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = fuzzy_matches(df, "id", "name", **kw)
    return {(r.id_a, r.id_b): r.dist for r in out.collect()}


class TestFuzzyMatches:
    def test_typo_recall_and_distance(self, spark):
        # one-char deletion past the block prefix => dist 1, same block
        rows = [
            (1, "moccasin steel burnished"),
            (2, "moccasin stel burnished"),
            (3, "totally different name"),
        ]
        got = _pairs(spark, rows, max_dist=2, block_len=4, cap=50)
        assert got == {(1, 2): 1}

    def test_normalization_folds_case_and_whitespace(self, spark):
        rows = [(1, "  Alpha   Beta "), (2, "alpha beta")]
        got = _pairs(spark, rows, max_dist=2, block_len=4, cap=50)
        assert got == {(1, 2): 0}

    def test_whitespace_variants_fold_to_same_block(self, spark):
        # tab / newline / NBSP between words fold to ' ' BEFORE the
        # non-ASCII strip — they must land in the SAME block as the
        # space-separated spelling, not have the separator deleted
        rows = [
            (1, "ab\tcd ef"),
            (2, "ab cd ef"),
            (3, "ab\ncd ef"),
            (4, "ab\u00a0cd ef"),  # NBSP separator
        ]
        got = _pairs(spark, rows, max_dist=2, block_len=4, cap=50)
        assert got == {(1, 2): 0, (1, 3): 0, (1, 4): 0,
                       (2, 3): 0, (2, 4): 0, (3, 4): 0}

    def test_stripped_codepoint_between_spaces_single_space(self, spark):
        # 'a 中 b' -> strip leaves 'a  b' -> final collapse gives 'a b'
        rows = [(1, "name a 中 b"), (2, "name a b")]
        got = _pairs(spark, rows, max_dist=2, block_len=4, cap=50)
        assert got == {(1, 2): 0}

    def test_ascii_normal_form(self, spark):
        # diacritics fold to base letters; other non-ASCII drops — the
        # explicit cross-engine contract (DuckDB levenshtein is byte-based)
        rows = [(1, "fuzzy blöck çafé"), (2, "fuzzy block cafe"),
                (3, "fuzzy block cafe中")]
        got = _pairs(spark, rows, max_dist=2, block_len=4, cap=50)
        assert got == {(1, 2): 0, (1, 3): 0, (2, 3): 0}

    def test_distance_boundary_inclusive(self, spark):
        rows = [
            (1, "abcdefgh"),
            (2, "abcdefxx"),  # dist 2 -> kept
            (3, "abcdexxx"),  # dist 3 from id 1 -> dropped
        ]
        got = _pairs(spark, rows, max_dist=2, block_len=4, cap=50)
        assert got == {(1, 2): 2, (2, 3): 1}

    def test_blocking_prefix_separates(self, spark):
        # dist 1 but first char differs => different blocks, no pair
        rows = [(1, "abcdef"), (2, "xbcdef")]
        assert _pairs(spark, rows, max_dist=2, block_len=4, cap=50) == {}

    def test_length_gap_pruned(self, spark):
        # |len diff| = 3 > max_dist prunes before levenshtein
        rows = [(1, "abcd"), (2, "abcdxyz")]
        assert _pairs(spark, rows, max_dist=2, block_len=4, cap=50) == {}
        # exactly max_dist apart survives (dist == len diff here)
        rows = [(1, "abcd"), (2, "abcdxy")]
        assert _pairs(spark, rows, max_dist=2, block_len=4, cap=50) == {
            (1, 2): 2
        }

    def test_null_and_empty_excluded(self, spark):
        rows = [(1, None), (None, "abcd"), (2, "   "), (3, "abcd"), (4, "abcd")]
        got = _pairs(spark, rows, max_dist=2, block_len=4, cap=50)
        assert got == {(3, 4): 0}

    def test_hot_block_cap_bounds_pairs(self, spark):
        # 20 identical-prefix names, cap 5 => at most C(5,2)=10 pairs,
        # and the kept subset is the deterministic md5-order head.
        rows = [(i, "dup block name %02d" % i) for i in range(20)]
        df = spark.createDataFrame(rows, SCHEMA)
        out = fuzzy_matches(df, "id", "name", max_dist=2, block_len=4, cap=5)
        n = out.count()
        assert n <= 10
        # deterministic: re-running yields the identical pair set
        a = sorted(map(tuple, out.select("id_a", "id_b").collect()))
        b = sorted(map(tuple, out.select("id_a", "id_b").collect()))
        assert a == b

    def test_single_join_plan(self, spark):
        df = spark.createDataFrame([(1, "abcd"), (2, "abce")], SCHEMA)
        plan = fuzzy_matches(df, "id", "name")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
