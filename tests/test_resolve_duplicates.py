"""Quality-aware duplicate resolution: highest quality wins, NULL
quality loses, min-id tiebreak, NULL-key passthrough, and the
aggregate-not-window plan shape."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark.functions.dedup import resolve_duplicates

ROWS = [
    # group A: d3 has best quality
    ("d1", "same text a", 10.0),
    ("d2", "same text a", 30.0),
    ("d3", "same text a", 90.0),
    # group B: tie on quality → min id (d4)
    ("d4", "same text b", 50.0),
    ("d5", "same text b", 50.0),
    # group C: all NULL quality → min id (d6)
    ("d6", "same text c", None),
    ("d7", "same text c", None),
    # group D: NULL quality loses to scored
    ("d8", "same text d", None),
    ("d9", "same text d", 1.0),
    # singletons + NULL text passthrough
    ("d10", "unique text here", 5.0),
    ("d11", None, 99.0),
    ("d12", None, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id string, text string, q double")


def test_quality_winner_per_group(docs):
    kept = {r["doc_id"] for r in resolve_duplicates(docs, "q").collect()}
    assert kept == {"d3", "d4", "d6", "d9", "d10", "d11", "d12"}


def test_full_rows_survive(docs):
    out = {r["doc_id"]: r for r in resolve_duplicates(docs, "q").collect()}
    assert out["d3"]["q"] == 90.0 and out["d3"]["text"] == "same text a"


def test_custom_key(docs):
    # key = first token → groups a/b/c/d all share key 'same' → one winner
    key = F.when(
        F.col("text").isNotNull(), F.split(F.col("text"), " ")[0]
    )
    kept = {r["doc_id"] for r in resolve_duplicates(docs, "q", key=key).collect()}
    # best quality among all 'same*' docs is d3 (90); 'unique*' keeps d10
    assert kept == {"d3", "d10", "d11", "d12"}


def test_plan_has_no_window(docs):
    plan = (
        resolve_duplicates(docs, "q")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_null_id_never_deletes_its_group(spark):
    """Review regression: a NULL-id doc must not win its group (NULL
    sorts first in struct comparison) — the semi-join would then match
    nothing and silently delete every member."""
    df = spark.createDataFrame(
        [("d1", "same group text", 5.0), (None, "same group text", 9.0),
         ("d2", "other group here", 1.0), (None, "other group here", 1.0)],
        "doc_id string, text string, q double",
    )
    kept = {r["doc_id"] for r in resolve_duplicates(df, "q").collect()}
    # the NULL-id doc loses in group 1 even with higher quality, and
    # loses the tie in group 2; NULL-id rows themselves drop (no identity
    # to keep by — same as distinct_by_fingerprint)
    assert kept == {"d1", "d2"}
