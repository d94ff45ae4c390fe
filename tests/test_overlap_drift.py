"""Unit tests for the cross-source overlap matrix, dup-group lang
conflicts, wave-over-wave vocabulary drift, and per-group exact
quantiles (session-16 batch 2)."""

import pytest

from evalidate_spark.functions import dedup, text
from evalidate_spark.operators.table_checks import group_quantiles


def docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ------------------------------------------------- source_overlap_matrix
def test_source_overlap_counts_shared_fps_and_docs(spark):
    d = docs(
        spark,
        [
            (1, "shared text", "en", "a", 1),
            (2, "shared text", "en", "b", 1),
            (3, "Shared   TEXT", "en", "b", 1),  # same fingerprint
            (4, "only in a", "en", "a", 1),
            (5, "other shared", "en", "a", 1),
            (6, "other shared", "en", "b", 1),
            (7, "c only", "en", "c", 1),
            (8, None, "en", "a", 1),  # no fingerprint
        ],
    )
    rows = {(r.source_a, r.source_b): r
            for r in dedup.source_overlap_matrix(d).collect()}
    assert set(rows) == {("a", "b")}
    r = rows[("a", "b")]
    assert r.shared_fps == 2
    assert r.docs_a == 2  # ids 1, 5
    assert r.docs_b == 3  # ids 2, 3, 6


def test_source_overlap_null_source_label(spark):
    d = docs(
        spark,
        [(1, "t", "en", None, 1), (2, "t", "en", "a", 1)],
    )
    rows = dedup.source_overlap_matrix(d).collect()
    assert len(rows) == 1
    # '__null__' < 'a' lexically
    assert rows[0].source_a == "__null__" and rows[0].source_b == "a"


# --------------------------------------------------- dup_lang_mismatch
def test_dup_lang_mismatch_reports_conflicts_only(spark):
    d = docs(
        spark,
        [
            (1, "dup body", "en", "s", 1),
            (2, "dup body", "es", "s", 1),
            (3, "dup body", "en", "s", 1),
            (4, "dup body", None, "s", 1),
            (5, "consistent", "fr", "s", 1),
            (6, "consistent", "fr", "s", 1),
        ],
    )
    rows = dedup.dup_lang_mismatch(d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == 4 and r.n_langs == 3
    assert r.langs == "__null__,en,es"


# -------------------------------------------------------- vocab_drift
def test_vocab_drift_closed_form(spark):
    # waves by id range (max id 9 -> mx 10, 5 waves of 2 ids):
    # wave 0 = {0,1}: tokens a a b     wave 1 = {2,3}: tokens a c
    rows = [
        (0, "a a", "en", "s", 1),
        (1, "b", "en", "s", 1),
        (2, "a", "en", "s", 1),
        (3, "c", "en", "s", 1),
    ] + [(i, "a", "en", "s", 1) for i in range(4, 10)]
    out = {r.from_wave: r for r in
           text.vocab_drift(docs(spark, rows), n_waves=5).collect()}
    # wave0 dist: a=2/3, b=1/3 -> bp 6666, 3333; wave1: a=1/2, c=1/2 -> 5000
    # tvd = (|6666-5000| + |3333-0| + |0-5000|) // 2 = (1666+3333+5000)//2
    assert out[0].tvd_bp == (1666 + 3333 + 5000) // 2
    assert out[0].new_types == 1  # 'c' unseen in wave 0
    assert out[0].new_occ_bp == 1 * 10000 // 2
    # waves 2..4 are all 'a': zero drift
    assert out[2].tvd_bp == 0 and out[2].new_types == 0
    with pytest.raises(ValueError):
        text.vocab_drift(docs(spark, rows), n_waves=1)


# ----------------------------------------------------- group_quantiles
def test_group_quantiles_exact_interpolation(spark):
    d = docs(
        spark,
        [(1, "t", "en", "s", 10), (2, "t", "en", "s", 20),
         (3, "t", "en", "s", 30), (4, "t", "en", "s", 40),
         (5, "t", "fr", "s", 7), (6, "t", None, "s", None)],
    )
    rows = {r["group"]: r for r in
            group_quantiles(d, "lang", "n_chars").collect()}
    en = rows["en"]
    # n=4: q25 at index 1+0.75 -> 10 + 0.75*10; q50 = 25; q75 = 32.5
    assert en.n == 4 and en.min == 10.0 and en.max == 40.0
    assert en.q25 == 17.5 and en.q50 == 25.0 and en.q75 == 32.5
    fr = rows["fr"]
    assert fr.n == 1 and fr.q50 == 7.0
    # NULL value row drops entirely -> no '__null__' group here
    assert "__null__" not in rows
    with pytest.raises(ValueError):
        group_quantiles(d, "lang", "n_chars", probs=(1.5,))


def test_group_quantiles_null_group_key(spark):
    d = docs(spark, [(1, "t", None, "s", 5), (2, "t", None, "s", 15)])
    rows = group_quantiles(d, "lang", "n_chars").collect()
    assert len(rows) == 1
    assert rows[0]["group"] == "__null__" and rows[0].q50 == 10.0


# -------------------------------------------------------- dim_coverage
def test_dim_coverage_closed_form(spark):
    from evalidate_spark.operators.table_checks import dim_coverage

    fact = spark.createDataFrame(
        [("m-1",), ("m-1",), ("m-3",), ("m-99",), (None,)], "ref string"
    )
    dim = spark.createDataFrame([("m-%d" % i,) for i in range(5)], "k string")
    r = dim_coverage(fact, "ref", dim, "k").collect()[0]
    assert r.n_dim == 5
    assert r.referenced == 2  # m-1, m-3
    assert r.unreferenced == 3
    assert r.coverage_bp == 2 * 10000 // 5
    assert r.dangling_values == 1  # m-99 (NULL ref ignored)


def test_dim_coverage_sort_merge_path_same_result(spark):
    from evalidate_spark.operators.table_checks import dim_coverage

    fact = spark.createDataFrame([("a",), ("z",)], "ref string")
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    fast = dim_coverage(fact, "ref", dim, "k").collect()[0]
    slow = dim_coverage(
        fact, "ref", dim, "k", broadcast_dim=False, broadcast_refs=False
    ).collect()[0]
    assert fast == slow


# ------------------------------------------------- blocking_comparison
def test_blocking_families_overlap_on_exact_dups(spark):
    import __spark_entry__ as e
    import os, tempfile

    # two identical docs: every LSH band collides AND they sort adjacent,
    # so the pair must land in 'both'; plus enough distinct filler that
    # neither family pairs anything else
    rows = [(1, "alpha beta gamma delta epsilon", "en", "s", 10),
            (2, "alpha beta gamma delta epsilon", "en", "s", 10)] + [
        (i, "filler %d q%d w%d" % (i, i * 7, i * 13), "en", "s", 5)
        for i in range(10, 16)
    ]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    out = {r.family: r.n_pairs for r in
           e.q_blocking_comparison(spark, tmp).collect()}
    assert set(out) == {"lsh_only", "snm_only", "both"}
    assert out["both"] >= 1


# ------------------------------------------------------- quality_trend
def test_quality_trend_flags(spark):
    import __spark_entry__ as e
    import os, tempfile

    long_fresh = " ".join("w%d" % i for i in range(12))  # 12 distinct tokens
    repetitive = " ".join(["rep"] * 12)  # 12 tokens, 1 distinct
    rows = [
        (0, long_fresh, "en", "s", 1),   # wave 0: ok
        (1, "tiny", "en", "s", 1),       # wave 0: short
        (8, repetitive, "en", "s", 1),   # wave 4: repetitive (not short)
        (9, None, "en", "s", 1),         # wave 4: short (0 tokens)
    ]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    out = {r.wave: r for r in e.q_quality_trend(spark, tmp).collect()}
    assert out[0].n_docs == 2 and out[0].short_bp == 5000
    assert out[0].repetitive_bp == 0
    assert out[4].n_docs == 2 and out[4].short_bp == 5000
    assert out[4].repetitive_bp == 5000
