"""Unit tests for the storage/shuffle advisors and group-wise token
top-k (session-16 batch 4)."""

import pytest

from evalidate_spark.functions import text
from evalidate_spark.operators.table_checks import (
    encoding_advisor,
    partition_advisor,
)


def docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_encoding_advisor_closed_form(spark):
    d = docs(
        spark,
        [(i, "tx%d" % i, "en", "s", 1) for i in range(100)]
        + [(100, None, "en", "s", 1)],
    )
    rows = {r.column: r for r in
            encoding_advisor(d, ["lang", "doc_id", "text"]).collect()}
    lang = rows["lang"]
    assert lang.n_rows == 101 and lang.n_distinct == 1
    assert lang.distinct_bp == 1 * 10000 // 101
    assert lang.avg_len_centi == 200  # 'en' = 2 chars
    assert lang.dict_candidate  # 1 distinct value over 101 rows
    did = rows["doc_id"]
    assert did.n_distinct == 101 and not did.dict_candidate
    tx = rows["text"]
    assert tx.n_distinct == 100  # NULL excluded from distinct
    # avg over the 100 non-null values: 'tx0'..'tx99'
    total_len = sum(len("tx%d" % i) for i in range(100))
    assert tx.avg_len_centi == total_len * 100 // 100
    with pytest.raises(ValueError):
        encoding_advisor(d, [])
    with pytest.raises(ValueError):
        encoding_advisor(d, ["nope"])


def test_partition_advisor_byte_model(spark):
    d = docs(
        spark,
        [(1, "abcde", "en", "src", 5), (2, None, None, None, None)],
    )
    r = partition_advisor(d, "docs").collect()[0]
    # fixed per row = doc_id(8) + n_chars(8) = 16; row1 strings 5+2+3
    assert r.tbl == "docs" and r.n_rows == 2
    assert r.est_bytes == (16 + 10) + 16
    assert r.avg_row_bytes == r.est_bytes // 2
    assert r.rec_partitions == 1
    # tiny target forces multiple partitions: 42 bytes at 1 MB -> still 1
    assert partition_advisor(d, "docs", target_mb=1).collect()[0].rec_partitions == 1
    with pytest.raises(ValueError):
        partition_advisor(d, "docs", target_mb=0)


def test_lang_top_tokens_rank_and_ties(spark):
    d = docs(
        spark,
        [
            (1, "b b b a a c", "en", "s", 1),
            (2, "z z Z", "fr", "s", 1),
            (3, None, "fr", "s", 1),
            (4, "only", None, "s", 1),
        ],
    )
    rows = text.lang_top_tokens(d, top_k=2).collect()
    en = sorted([r for r in rows if r["group"] == "en"], key=lambda r: r.rank)
    assert [(r.token, r.cnt, r.rank) for r in en] == [("b", 3, 1), ("a", 2, 2)]
    assert en[0].share_bp == 3 * 10000 // 6
    fr = [r for r in rows if r["group"] == "fr"]
    assert len(fr) == 1 and fr[0].token == "z" and fr[0].cnt == 3  # lowercased
    nl = [r for r in rows if r["group"] == "__null__"]
    assert len(nl) == 1 and nl[0].token == "only"
    with pytest.raises(ValueError):
        text.lang_top_tokens(d, top_k=0)


def test_lang_top_tokens_deterministic_tie_cut(spark):
    # four tokens all count 1: top-2 must be the lexicographically first two
    d = docs(spark, [(1, "d c b a", "en", "s", 1)])
    rows = sorted(text.lang_top_tokens(d, top_k=2).collect(),
                  key=lambda r: r.rank)
    assert [r.token for r in rows] == ["a", "b"]


def test_pr_curve_closed_form(spark):
    from evalidate_spark.functions.classifier import pr_curve

    # scores: 30(pos), 20(pos,neg), 10(neg), NULLs excluded
    d = spark.createDataFrame(
        [(30, True), (20, True), (20, False), (10, False),
         (None, True), (10, None)],
        "score int, label boolean",
    )
    rows = {r.threshold: r for r in pr_curve(d, "score", "label").collect()}
    assert set(rows) == {30, 20, 10}
    # threshold 30: predict pos for score>=30 -> tp=1 fp=0 fn=1 tn=2
    r30 = rows[30]
    assert (r30.tp, r30.fp, r30.fn, r30.tn) == (1, 0, 1, 2)
    assert r30.precision_bp == 10000 and r30.recall_bp == 5000
    # threshold 20: tp=2 fp=1 fn=0 tn=1
    r20 = rows[20]
    assert (r20.tp, r20.fp, r20.fn, r20.tn) == (2, 1, 0, 1)
    assert r20.precision_bp == 2 * 10000 // 3 and r20.recall_bp == 10000
    # threshold 10: everything positive
    r10 = rows[10]
    assert (r10.tp, r10.fp, r10.fn, r10.tn) == (2, 2, 0, 0)
    assert r10.recall_bp == 10000


def test_pr_curve_monotone_recall(spark):
    from evalidate_spark.functions.classifier import pr_curve

    d = spark.createDataFrame(
        [(i % 7, i % 3 == 0) for i in range(50)], "score int, label boolean"
    )
    rows = sorted(pr_curve(d, "score", "label").collect(),
                  key=lambda r: -r.threshold)
    rec = [r.recall_bp for r in rows]
    assert rec == sorted(rec)  # recall non-decreasing as threshold drops
    assert rec[-1] == 10000
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == 50


def test_partition_balance_even_vs_colliding(spark):
    from evalidate_spark.operators.table_checks import partition_balance

    # 3200 distinct keys into 32 buckets: md5 spreads them near-evenly
    even = spark.range(3200).selectExpr("cast(id as string) k")
    r = partition_balance(even, "k", 32).collect()[0]
    assert r.n_rows == 3200 and r.null_rows == 0
    assert r.avg_rows == 100
    assert r.balanced and r.max_skew_bp < 15000
    assert r.min_rows > 0  # every bucket used at this fill

    # 2 distinct keys into 32 buckets: most buckets empty -> min_rows 0,
    # one bucket owns >= half the rows -> wildly unbalanced
    two = spark.range(1000).selectExpr("cast(id % 2 as string) k")
    r2 = partition_balance(two, "k", 32).collect()[0]
    assert r2.min_rows == 0
    assert r2.max_rows >= 500
    assert not r2.balanced and r2.max_skew_bp >= 16 * 10000

    with pytest.raises(ValueError):
        partition_balance(two, "k", 0)


def test_partition_balance_null_rows_reported(spark):
    from evalidate_spark.operators.table_checks import partition_balance

    d = spark.createDataFrame([("a",), (None,), (None,)], "k string")
    r = partition_balance(d, "k", 4).collect()[0]
    assert r.n_rows == 1 and r.null_rows == 2


def test_id_collisions_benign_vs_real(spark):
    from evalidate_spark.operators.table_checks import id_collisions

    rows = [
        (1, "same", "en", "s", 1), (1, "same", "en", "s", 1),   # benign
        (2, "v1", "en", "s", 1), (2, "v2", "en", "s", 1),       # collision
        (3, None, "en", "s", 1), (3, "", "en", "s", 1),         # NULL != ''
        (4, "solo", "en", "s", 1),                              # unique: out
        (None, "x", "en", "s", 1), (None, "y", "en", "s", 1),   # NULL id: out
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.id: (r.n_rows, r.n_variants, r.benign)
           for r in id_collisions(d, "doc_id", ["text", "lang"]).collect()}
    assert got == {1: (2, 1, True), 2: (2, 2, False), 3: (2, 2, False)}
    with pytest.raises(ValueError):
        id_collisions(d, "doc_id", [])


def test_id_collisions_cap_is_deterministic(spark):
    from evalidate_spark.operators.table_checks import id_collisions

    # ids 0..9 each duplicated; id 5 triplicated -> it must survive a cap of 3
    rows = [(i, "t%d" % i, "e", "s", 1) for i in range(10) for _ in range(2)]
    rows += [(5, "t5", "e", "s", 1)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [r.id for r in id_collisions(d, "doc_id", ["text"], max_ids=3).collect()]
    assert got == [5, 0, 1]  # rows desc, then id asc


def test_group_freshness_per_feed_lag(spark):
    from evalidate_spark.operators.table_checks import group_freshness

    d = spark.createDataFrame(
        [
            (1, "2024-01-31 11:00:00", "live"),
            (2, "2024-01-30 11:00:00", "live"),
            (3, "2024-01-20 00:00:00", "dead"),
            (4, None, "ghost"),
            (5, "2024-01-31 10:00:00", None),
        ],
        "id long, ts_s string, feed string",
    ).selectExpr("id", "cast(ts_s as timestamp) ts", "feed")
    got = {r["group"]: r for r in group_freshness(
        d, "ts", "feed", as_of="2024-01-31 12:00:00").collect()}
    assert got["live"].fresh and got["live"].lag_s == 3600
    assert not got["dead"].fresh and got["dead"].lag_s == 11 * 86400 + 43200
    # all-NULL ts: no data is stale data
    assert got["ghost"].max_ts_s is None and not got["ghost"].fresh
    assert got["__null__"].fresh  # untagged feed surfaces with its own lag
    with pytest.raises(ValueError):
        group_freshness(d, "ts", "feed", as_of="bad")


def test_dispersion_profile_fano(spark):
    from evalidate_spark.operators.table_checks import dispersion_profile

    rows = []
    # 'even': 4 users x 5 events each -> variance 0 -> fano 0
    for u in range(4):
        rows += [(u, "even")] * 5
    # 'bursty': counts 1,1,1,9 -> mean 3, var (4*84-144)/(3*12)... exact:
    # k=4 S=12 Q=1+1+1+81=84 -> fano = (4*84-144)*100 // (3*12) = 533
    rows += [(10, "bursty"), (11, "bursty"), (12, "bursty")] + [(13, "bursty")] * 9
    rows += [(20, None)]          # NULL group -> __null__
    rows += [(None, "ghost")]     # NULL key excluded -> group absent
    d = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r["group"]: r for r in
           dispersion_profile(d, "event_type", "user_id").collect()}
    assert got["even"].fano_centi == 0 and not got["even"].bursty
    b = got["bursty"]
    assert b.n_keys == 4 and b.n_events == 12
    assert b.mean_events_centi == 300
    assert b.fano_centi == (4 * 84 - 144) * 100 // (3 * 12)
    assert b.bursty
    # single-key group: fano undefined, never bursty
    assert got["__null__"].fano_centi is None and not got["__null__"].bursty
    assert "ghost" not in got


def test_pmi_collocations_ranks_glued_pairs(spark):
    from evalidate_spark.functions import text as T

    # 'new york' always together (5x); 'the' everywhere dilutes its PMI
    docs_rows = [(i, "the cat new york saw the dog new york", "en", "s", 1)
                 for i in range(5)]
    d = spark.createDataFrame(
        docs_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = T.pmi_collocations(d, min_count=2, top_k=5).collect()
    assert rows, "expected collocations"
    import math

    # N=40 bigrams; the 1-to-1 pairs (saw→the, york→saw: c1=c2=5) top out
    # at ln(5·40/25)=ln 8, tie broken w1-asc -> (saw, the) first
    top = rows[0]
    assert (top.w1, top.w2) == ("saw", "the")
    assert top.pmi_milli == math.floor(math.log(8) * 1000)
    got = {(r.w1, r.w2): r for r in rows}
    # the glued pair: c12=10, c1=c2=10 -> ln(10·40/100)=ln 4, count 10
    ny = got[("new", "york")]
    assert ny.n_pair == 10
    assert ny.pmi_milli == math.floor(math.log(4) * 1000)
    # pmi ordering is non-increasing
    pmis = [r.pmi_milli for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    with pytest.raises(ValueError):
        T.pmi_collocations(d, min_count=0)
