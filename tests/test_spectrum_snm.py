"""Unit tests for the session-16 corpus-economics operators: sorted-
neighborhood blocking (snm_pairs), LSH band telemetry (lsh_band_stats),
duplication-inflation curve (dup_inflation), ingest novelty decay
(novelty_trend), vocabulary spectrum (vocab_spectrum), and token
fertility (token_fertility).  All closed-form expectations are computed
by hand on tiny corpora; the sf/hostile hash gates cover the SQL-parity
side."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark.functions import dedup, text


def docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ------------------------------------------------------------- snm_pairs
def test_snm_finds_prefix_stable_near_dup(spark):
    # two docs identical except a truncated tail: same 16-char key prefix,
    # adjacent in sort order -> candidate; LSH could miss this shape when
    # the tail edit lands in every band
    base = "alpha beta gamma delta epsilon zeta"
    d = docs(
        spark,
        [
            (1, base, "en", "a", 1),
            (2, base + " eta theta", "en", "a", 1),
            (3, "zzz completely different text here", "en", "a", 1),
        ],
    )
    out = {
        (r.id_a, r.id_b): r
        for r in dedup.snm_pairs(d, window=2).collect()
    }
    assert (1, 2) in out
    p = out[(1, 2)]
    # tokens: a=6 distinct, b=8 distinct, inter=6 -> 6*10000 div 8 = 7500
    assert p.jaccard_bp == 7500
    assert p.gap == 1
    assert not p.is_near  # default threshold 8000


def test_snm_respects_blocks_and_window(spark):
    # docs in different 2-char blocks never pair, even if globally adjacent
    d = docs(
        spark,
        [
            (1, "aa one two", "en", "a", 1),
            (2, "bb one two", "en", "a", 1),
            (10, "cc x0", "en", "a", 1),
            (11, "cc x1", "en", "a", 1),
            (12, "cc x2", "en", "a", 1),
            (13, "cc x3", "en", "a", 1),
        ],
    )
    pairs = {
        (r.id_a, r.id_b) for r in dedup.snm_pairs(d, window=2).collect()
    }
    assert (1, 2) not in pairs
    # within the 'cc' block, window=2 pairs each doc with <=2 successors
    assert (10, 11) in pairs and (10, 12) in pairs
    assert (10, 13) not in pairs
    assert (11, 13) in pairs


def test_snm_null_and_param_contracts(spark):
    d = docs(
        spark,
        [(1, None, "en", "a", 1), (None, "aa one", "en", "a", 1),
         (2, "aa one", "en", "a", 1)],
    )
    # NULL text and NULL id rows never enter -> no candidates at all
    assert dedup.snm_pairs(d).count() == 0
    with pytest.raises(ValueError):
        dedup.snm_pairs(d, window=0)
    with pytest.raises(ValueError):
        dedup.snm_pairs(d, block_chars=4, key_chars=2)


def test_snm_window_is_partitioned(spark):
    # the rank window must key on the block -- a global (unpartitioned)
    # window would serialize the corpus through one task.  Spark renders
    # executed-plan Window nodes as `Window [fns], [part exprs], [order
    # exprs]` (never the literal `partitionBy=`), so assert the
    # windowspecdefinition itself mentions the block key.
    import re

    d = docs(spark, [(i, "t%d word" % i, "en", "a", 1) for i in range(20)])
    plan = (
        dedup.snm_pairs(d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    wins = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert wins, "no Window node in plan:\n" + plan
    for spec in wins:
        assert "__block" in spec, (
            "window not partitioned by __block: %s" % spec
        )


# -------------------------------------------------------- lsh_band_stats
def test_band_stats_identical_docs(spark):
    n = 5
    d = docs(spark, [(i, "same exact text here", "en", "a", 1) for i in range(n)])
    rows = dedup.lsh_band_stats(d, num_hashes=16, bands=8).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n_buckets == 1 and r.max_bucket == n
        assert r.n_docs == n and r.multi_buckets == 1
        assert r.est_pairs == n * (n - 1) // 2
        assert r.capped_pairs == n * (n - 1) // 2  # below the cap


def test_band_stats_cap_arithmetic(spark):
    n = 7
    d = docs(spark, [(i, "dup dup dup", "en", "a", 1) for i in range(n)])
    rows = dedup.lsh_band_stats(d, max_bucket=3).collect()
    for r in rows:
        assert r.est_pairs == 21  # 7*6/2 uncapped
        assert r.capped_pairs == 3  # least(7,3) -> 3*2/2


def test_band_stats_matches_candidate_volume(spark):
    # distinct docs: per-band bucket sizes must sum to the banded row
    # count (n_docs = non-NULL-text docs in every band)
    d = docs(
        spark,
        [(i, "text number %d with words" % i, "en", "a", 1) for i in range(10)]
        + [(99, None, "en", "a", 1)],
    )
    for r in dedup.lsh_band_stats(d).collect():
        assert r.n_docs == 10


# --------------------------------------------------------- dup_inflation
def test_dup_inflation_closed_form(spark):
    d = docs(
        spark,
        [
            (1, "unique one", "en", "a", 10),
            (2, "dup text", "en", "a", 8),
            (3, "dup text", "en", "a", 6),
            (4, "Dup   TEXT", "en", "a", 7),  # same fingerprint (normalised)
            (5, None, "en", "a", 99),  # no fingerprint -> excluded
        ],
    )
    rows = {r.multiplicity: r for r in dedup.dup_inflation(d).collect()}
    assert set(rows) == {"1", "3-10"}
    assert rows["1"].n_groups == 1 and rows["1"].n_docs == 1
    assert rows["1"].weight == 10 and rows["1"].excess_weight == 0
    g = rows["3-10"]
    assert g.n_groups == 1 and g.n_docs == 3
    assert g.weight == 8 + 6 + 7
    # survivor = min doc_id (2, weight 8) -> excess = 21 - 8
    assert g.excess_weight == 13
    # shares over total weight 31
    assert rows["1"].weight_share_bp == 10 * 10000 // 31
    assert g.weight_share_bp == 21 * 10000 // 31


# --------------------------------------------------------- novelty_trend
def test_novelty_trend_repeats_count_only_later_docs(spark):
    # ids 0..9 -> 5 buckets of 2; text A first appears at id 0, repeats at
    # 4 and 8; B first at 1, repeats at 9; NULL text never repeats
    rows = []
    for i in range(10):
        t = "fresh %d" % i
        if i in (4, 8):
            t = "fresh 0"
        if i == 9:
            t = "fresh 1"
        rows.append((i, t, "en", "a", 1))
    rows.append((10, None, "en", "a", 1))  # bucket 4 (max id)
    d = docs(spark, rows)
    out = {r.bucket: r for r in dedup.novelty_trend(d, n_buckets=5).collect()}
    # max id 10 -> mx 11; bucket = id*5 div 11:
    # 0:{0,1,2} 1:{3,4} 2:{5,6} 3:{7,8} 4:{9,10}
    assert out[0].n_repeats == 0 and out[0].n_docs == 3
    assert out[1].n_repeats == 1  # id 4
    assert out[3].n_repeats == 1  # id 8
    assert out[4].n_repeats == 1  # id 9 (10 is NULL text, never a repeat)
    assert out[4].n_docs == 2
    assert out[4].repeat_bp == 1 * 10000 // 2


def test_novelty_trend_negative_ids_clamp(spark):
    d = docs(
        spark,
        [(-5, "neg", "en", "a", 1), (0, "zero", "en", "a", 1),
         (9, "nine", "en", "a", 1)],
    )
    out = {r.bucket: r.n_docs for r in dedup.novelty_trend(d, n_buckets=5).collect()}
    assert out[0] == 2  # -5 clamps into bucket 0 alongside id 0
    assert out[4] == 1


# -------------------------------------------------------- vocab_spectrum
def test_vocab_spectrum_closed_form(spark):
    # 'a' x12 (bucket 11-100), 'b' x2 (2-10), 'c','d' x1 (1)
    d = docs(
        spark,
        [
            (1, " ".join(["a"] * 12), "en", "s", 1),
            (2, "b B c", "en", "s", 1),
            (3, "d", "en", "s", 1),
            (4, None, "en", "s", 1),
        ],
    )
    out = {r.bucket: r for r in text.vocab_spectrum(d).collect()}
    assert out["1"].n_types == 2 and out["1"].n_occurrences == 2
    assert out["2-10"].n_types == 1 and out["2-10"].n_occurrences == 2
    assert out["11-100"].n_types == 1 and out["11-100"].n_occurrences == 12
    # shares: 4 types, 16 occurrences
    assert out["1"].type_share_bp == 2 * 10000 // 4
    assert out["11-100"].occ_share_bp == 12 * 10000 // 16
    with pytest.raises(ValueError):
        text.vocab_spectrum(d, edges=(10, 1))


# ------------------------------------------------------- token_fertility
def test_token_fertility_closed_form(spark):
    d = docs(
        spark,
        [
            (1, "abcd efghefgh x", "en", "s", 1),  # 15 chars, 3 ws, 1+2+1=4 bpe
            (2, None, "en", "s", 1),  # counted, zero chars/tokens
            (3, "ab", None, "s", 1),  # NULL lang -> __null__
        ],
    )
    out = {r["group"]: r for r in text.token_fertility(d).collect()}
    en = out["en"]
    assert en.n_docs == 2 and en.n_chars == 15
    assert en.ws_tokens == 3 and en.bpe_tokens == 4
    assert en.chars_per_token_centi == 15 * 100 // 3
    assert en.pieces_per_word_centi == 4 * 100 // 3
    nl = out["__null__"]
    assert nl.n_docs == 1 and nl.n_chars == 2 and nl.ws_tokens == 1
    assert nl.bpe_tokens == 1


def test_token_fertility_zero_token_group_null_ratio(spark):
    d = docs(spark, [(1, None, "xx", "s", 1)])
    r = text.token_fertility(d).collect()[0]
    assert r.chars_per_token_centi is None
    assert r.pieces_per_word_centi is None
