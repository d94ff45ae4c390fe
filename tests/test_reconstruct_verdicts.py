"""reconstruct_text ordering/NULL contracts, keyed_verdicts consistency
with the rich engine, and ngram_dup_stats edge cases."""

import pytest
from pyspark.sql import Row, functions as F

from evalidate_spark.fastpath import keyed_verdicts, verdict_scan
from evalidate_spark.functions.text import ngram_dup_stats
from evalidate_spark.operators.spans import reconstruct_text
from evalidate_spark.spec import Allowed, Rule, Size
from evalidate_spark import validate

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _sp(kind, text=None, ref=None, off=None):
    return Row(kind=kind, text=text, media_ref=ref, offset=off)


def test_reconstruct_orders_by_offset_then_index(spark):
    rows = [
        (
            "d1",
            [
                _sp("text", text="world", off=10),
                _sp("media", ref="m-1", off=5),
                _sp("text", text="hello ", off=0),
            ],
        )
    ]
    out = reconstruct_text(spark.createDataFrame(rows, SPAN_SCHEMA)).collect()[0]
    assert out.rendered == "hello <media:m-1>world"
    assert (out.n_text_spans, out.n_media_spans) == (2, 1)


def test_reconstruct_stable_on_ties_and_nulls_last(spark):
    rows = [
        (
            "d1",
            [
                _sp("text", text="b", off=None),  # NULL offset → last
                _sp("text", text="a", off=3),
                _sp("text", text="a2", off=3),  # tie → ingest order
                _sp("media", ref=None, off=None),  # NULL ref renders empty
            ],
        )
    ]
    out = reconstruct_text(spark.createDataFrame(rows, SPAN_SCHEMA)).collect()[0]
    assert out.rendered == "aa2b<media:>"


def test_reconstruct_null_spans_and_unknown_kind(spark):
    rows = [
        ("d0", None),
        ("d1", [_sp("meta", text="IGNORED", off=0), _sp("text", text="x", off=1)]),
        ("d2", [_sp("text", text=None, off=0)]),  # NULL text renders empty
    ]
    got = {
        r.doc_id: r
        for r in reconstruct_text(spark.createDataFrame(rows, SPAN_SCHEMA)).collect()
    }
    assert got["d0"].rendered is None
    assert (got["d0"].n_text_spans, got["d0"].n_media_spans) == (0, 0)
    assert got["d1"].rendered == "x"
    assert got["d1"].n_text_spans == 1  # 'meta' not counted as text
    assert got["d2"].rendered == ""


DOCS_SCHEMA = "doc_id long, lang string, n long"
DOC_RULES = [
    Rule(key="doc_id", presence="required"),
    Rule(key="lang", presence="required", validators=[Allowed(["en", "es"])]),
    Rule(key="n", presence="required", validators=[Size(0, 10)]),
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "en", 5),
        (2, "zz", 5),  # fails allowed
        (3, "en", 99),  # fails size
        (None, "es", 1),  # fails required
        (8, "en", 2),
        (16, "es", 3),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_keyed_verdicts_matches_rich_engine(spark, docs):
    unit = (
        F.when(F.col("doc_id").isNull(), F.lit(-1))
        .otherwise(F.col("doc_id") % 2)
        .cast("long")
    )
    got = {r.unit_id: r for r in keyed_verdicts(docs, DOC_RULES, unit).collect()}
    # rich-engine ground truth: docs with >=1 violation
    viol_ids = {
        r.doc_id
        for r in validate(docs, DOC_RULES, id_cols=["doc_id"]).violations.collect()
    }
    assert viol_ids == {2, 3, None}
    assert got[-1].n_rows == 1 and got[-1].n_failed == 1 and got[-1].verdict == "fail"
    assert got[0].n_rows == 3 and got[0].n_failed == 1  # doc 2
    assert got[1].n_rows == 2 and got[1].n_failed == 1  # doc 3 (NULL-id is unit -1)
    assert got[0].verdict == "fail" and got[1].verdict == "fail"


def test_keyed_verdicts_pass_and_totals_match_verdict_scan(spark, docs):
    clean = docs.filter(F.col("doc_id").isin(1, 8))
    out = keyed_verdicts(clean, DOC_RULES, F.lit(7).cast("long")).collect()
    assert len(out) == 1 and out[0].verdict == "pass" and out[0].n_failed == 0
    # same totals as the physical-partition roll-up
    vs = verdict_scan(docs, DOC_RULES).agg(
        F.sum("rows").alias("r"), F.sum("failed").alias("f")
    ).collect()[0]
    kv = keyed_verdicts(docs, DOC_RULES, F.lit(0)).collect()[0]
    assert (vs.r, vs.f) == (kv.n_rows, kv.n_failed)


def test_ngram_dup_stats_marks_cross_doc_ngrams(spark):
    rows = [
        (1, "a b c d"),  # shingles: "a b c", "b c d"
        (2, "a b c x"),  # shares "a b c"
        (3, "zz yy"),  # short → single whole-text shingle, unique
        (4, None),  # NULL text → 0 ngrams
        (None, "a b c d"),  # NULL id: counts toward corpus, reports 0 dups
    ]
    out = {
        r.doc_id: r
        for r in ngram_dup_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    # "a b c" in docs 1,2,NULL; "b c d" in 1,NULL → both duplicated
    assert (out[1].n_ngrams, out[1].n_dup_ngrams, out[1].dup_bp) == (2, 2, 10000)
    assert (out[2].n_ngrams, out[2].n_dup_ngrams, out[2].dup_bp) == (2, 1, 5000)
    assert (out[3].n_ngrams, out[3].n_dup_ngrams) == (1, 0)
    assert (out[4].n_ngrams, out[4].n_dup_ngrams, out[4].dup_bp) == (0, 0, 0)
    assert (out[None].n_ngrams, out[None].n_dup_ngrams) == (2, 0)


class TestPlanShape:
    def test_reconstruct_is_pure_map(self, spark, tmp_path):
        from evalidate_spark.fixtures import gen_documents

        path = str(tmp_path / "docs_recon")
        gen_documents(spark, 200, partitions=2).write.parquet(path)
        docs = spark.read.parquet(path)
        plan = (
            reconstruct_text(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # flatten/render must not shuffle, window, or explode
        assert "Exchange" not in plan, plan
        assert "Generate" not in plan, plan

    def test_keyed_verdicts_single_exchange(self, spark, tmp_path):
        path = str(tmp_path / "docs_kv")
        spark.range(300).selectExpr(
            "id as doc_id", "cast(id as string) lang", "id % 20 as n"
        ).repartition(4).write.parquet(path)
        docs = spark.read.parquet(path)
        out = keyed_verdicts(docs, DOC_RULES, (F.col("doc_id") % 8).cast("long"))
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # partial agg map-side → ONE exchange of ≤8×partitions rows
        assert final.count("Exchange hashpartitioning") == 1, final


def test_winsorize_clips_and_passes_nulls(spark):
    import pytest as _pt
    from evalidate_spark.operators.table_checks import winsorize

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
        + [(99, None)],
        "id long, v double",
    )
    out = {r.id: r.v_winsorized for r in winsorize(df, "v", 0.1, 0.9, exact=True).collect()}
    # exact p10/p90 over n=10: rank p*(n-1)=0.9 → p10=1.9 ; rank 8.1 → p90=9+0.1*991
    assert out[0] == 1.9 and out[1] == 2.0  # low tail clipped up, 2.0 untouched
    assert out[5] == 6.0  # interior untouched
    assert out[9] == _pt.approx(9 + 0.1 * 991)  # 1000 clipped to p90
    assert out[99] is None  # NULL passes through
    with _pt.raises(ValueError):
        winsorize(df, "v", 0.9, 0.1)


def test_check_suite_statuses(spark):
    import pytest as _pt
    from evalidate_spark.operators.table_checks import check_suite

    empty = spark.range(0).selectExpr("id as doc_id")
    bad = spark.range(3).selectExpr("id as doc_id")
    out = {r.check_id: r for r in check_suite([("a", empty), ("b", bad)]).collect()}
    assert out["a"].n_violations == 0 and out["a"].status == "pass"
    assert out["b"].n_violations == 3 and out["b"].status == "fail"
    with _pt.raises(ValueError):
        check_suite([])
