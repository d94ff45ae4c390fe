"""Unit tests for dedup.ssjoin_pairs (exact prefix-filtered set-similarity
self-join) and table_checks.column_entropy.

The ssjoin exactness test brute-forces all-pairs Jaccard in Python over a
seeded corpus with heavy shared boilerplate — precisely the regime where a
buggy prefix length silently drops qualifying pairs — and asserts the
Spark result is the SAME SET of pairs with the same scores."""

from __future__ import annotations

import itertools
import math
import random

import pytest

from evalidate_spark.functions import dedup
from evalidate_spark.operators.table_checks import column_entropy


def _shingles(text: str, k: int = 3) -> set:
    t = text.split()
    return {" ".join(t[i : i + k]) for i in range(max(len(t) - k + 1, 1))}


def _brute_pairs(docs, threshold, k=3):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(docs), 2):
        a, b = _shingles(ta, k), _shingles(tb, k)
        j = len(a & b) / len(a | b)
        if j >= threshold:
            out[(ia, ib)] = round(j, 6)
    return out


class TestSSJoinPairs:
    def _df(self, spark, docs):
        return spark.createDataFrame(docs, "doc_id string, text string")

    def test_exact_vs_bruteforce_boilerplate_corpus(self, spark):
        # Seeded corpus: a shared boilerplate prefix (high-df shingles that
        # must fall OUT of prefixes) plus per-doc bodies drawn from a tiny
        # vocabulary so many pairs land near the threshold.
        rng = random.Random(7)
        boiler = "terms of service apply to all content on this site"
        vocab = ["alpha", "beta", "gamma", "delta", "eps"]
        docs = []
        for i in range(24):
            body = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9)))
            docs.append((f"d{i:02d}", f"{boiler} {body}"))
        # exact duplicates and a doc equal to bare boilerplate
        docs.append(("d90", docs[0][1]))
        docs.append(("d91", boiler))
        for thr in (0.5, 0.8, 1.0):
            want = _brute_pairs(docs, thr)
            got = {
                (r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.ssjoin_pairs(
                    self._df(spark, docs), threshold=thr
                ).collect()
            }
            assert set(got) == set(want), thr
            for p in want:
                assert got[p] == pytest.approx(want[p], abs=1e-6)

    def test_threshold_boundary_exact_point(self, spark):
        # |A|=5, |B|=4, intersection 4 → Jaccard = 4/5 = 0.8 exactly.
        # IEEE ceil(0.8*5) without slack would shorten the prefix and the
        # size filter would reject 4 >= 0.8*5; both must keep the pair.
        a = "t1 t2 t3 t4 t5 t6 t7"  # 5 distinct 3-shingles
        b = "t1 t2 t3 t4 t5 t6"  # 4, all shared
        got = dedup.ssjoin_pairs(
            self._df(spark, [("a", a), ("b", b)]), threshold=0.8
        ).collect()
        assert len(got) == 1 and got[0]["jaccard"] == pytest.approx(0.8)

    def test_null_rows_excluded(self, spark):
        docs = [("a", "x y z w"), ("b", "x y z w"), (None, "x y z w"), ("c", None)]
        got = dedup.ssjoin_pairs(self._df(spark, docs), threshold=0.9).collect()
        assert [(r["id_a"], r["id_b"]) for r in got] == [("a", "b")]

    def test_bad_threshold_raises(self, spark):
        df = self._df(spark, [("a", "x")])
        with pytest.raises(ValueError):
            dedup.ssjoin_pairs(df, threshold=0.0)
        with pytest.raises(ValueError):
            dedup.ssjoin_pairs(df, threshold=1.5)


class TestColumnEntropy:
    def _rows(self, spark, vals, typ="string"):
        return spark.createDataFrame([(v,) for v in vals], f"c {typ}")

    def test_known_distributions(self, spark):
        const = column_entropy(self._rows(spark, ["a"] * 8), ["c"]).collect()[0]
        assert const["entropy_bits"] == 0.0
        assert (const["n"], const["n_distinct"]) == (8, 1)
        coin = column_entropy(
            self._rows(spark, ["a"] * 4 + ["b"] * 4), ["c"]
        ).collect()[0]
        assert coin["entropy_bits"] == pytest.approx(1.0, abs=1e-6)
        quad = column_entropy(
            self._rows(spark, list("abcd") * 3), ["c"]
        ).collect()[0]
        assert quad["entropy_bits"] == pytest.approx(2.0, abs=1e-6)
        skew = column_entropy(
            self._rows(spark, ["a"] * 3 + ["b"]), ["c"]
        ).collect()[0]
        want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
        assert skew["entropy_bits"] == pytest.approx(want, abs=1e-6)

    def test_null_is_its_own_category(self, spark):
        r = column_entropy(
            self._rows(spark, ["a", "a", None, None]), ["c"]
        ).collect()[0]
        assert r["entropy_bits"] == pytest.approx(1.0, abs=1e-6)
        assert r["n_distinct"] == 2
        all_null = column_entropy(
            self._rows(spark, [None, None, None]), ["c"]
        ).collect()[0]
        assert all_null["entropy_bits"] == 0.0
        assert (all_null["n"], all_null["n_distinct"]) == (3, 1)

    def test_unique_key_reads_log2_n(self, spark):
        r = column_entropy(
            self._rows(spark, [str(i) for i in range(16)]), ["c"]
        ).collect()[0]
        assert r["entropy_bits"] == pytest.approx(4.0, abs=1e-6)

    def test_multi_column_one_row_each(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 2)], "x string, y int"
        )
        rows = {r["column"]: r for r in column_entropy(df, ["x", "y"]).collect()}
        assert rows["x"]["entropy_bits"] == 0.0
        assert rows["y"]["entropy_bits"] == pytest.approx(1.0, abs=1e-6)

    def test_errors(self, spark):
        df = self._rows(spark, ["a"])
        with pytest.raises(ValueError):
            column_entropy(df, [])
        with pytest.raises(ValueError):
            column_entropy(df, ["nope"])
