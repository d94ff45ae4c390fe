"""Linear bag-of-words classifier: hand-computed scores, map ≡ join
bit-identity (incl. hostile NULL/empty/multi-space rows), floor-division
semantics on negative means, and the zero-shuffle plan shape of the map
strategy."""

import pytest

from evalidate_spark.functions.classifier import classifier_scores

W = {"the": -40, "data": 250, "noise": -900, "zero": 0}

DOCS = [
    ("d1", "the data the data"),        # sum=420 n=4 → floor(105) = 105
    ("d2", "noise noise"),              # sum=-1800 n=2 → -900
    ("d3", "unknown words only"),       # sum=0 hits=0 n=3 → 0
    ("d4", None),                       # empty doc → bias only
    ("d5", ""),                         # empty string → bias only
    ("d6", "the"),                      # sum=-40 n=1 → -40
    ("d7", "the data"),                 # sum=210 n=2 → 105
    ("d8", "noise the the"),            # sum=-980 n=3 → floor(-326.67) = -327
    ("d9", "zero zero"),                # 0-weight vocab entry: hits=2 logit=0
    ("d10", "THE Data"),                # case-folded lookup
    (None, "dropped"),                  # NULL id dropped
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


@pytest.mark.parametrize("strategy", ["map", "join"])
def test_scores_hand_computed(docs, strategy):
    out = _by_id(
        classifier_scores(
            docs, W, bias_milli=10, threshold_milli=0, strategy=strategy
        )
    )
    assert set(out) == {f"d{i}" for i in range(1, 11)}
    assert out["d1"] == dict(
        doc_id="d1", n_tokens=4, hits=4, logit_milli=115, keep=True
    )
    assert out["d2"]["logit_milli"] == 10 - 900
    assert out["d3"] == dict(
        doc_id="d3", n_tokens=3, hits=0, logit_milli=10, keep=True
    )
    for empty in ("d4", "d5"):
        assert out[empty] == dict(
            doc_id=empty, n_tokens=0, hits=0, logit_milli=10, keep=True
        )
    # floor (not truncate-toward-zero) on a negative mean: -980/3 → -327
    assert out["d8"]["logit_milli"] == 10 - 327
    # a legitimate 0-weight vocabulary entry still counts as a hit
    assert out["d9"] == dict(
        doc_id="d9", n_tokens=2, hits=2, logit_milli=10, keep=True
    )
    assert out["d10"]["hits"] == 2
    assert out["d6"]["keep"] is False


def test_map_join_bit_identical(spark, docs):
    from evalidate_spark.fixtures import HOSTILE_DOCS

    hostile = spark.createDataFrame(
        [(str(r[0]) if r[0] is not None else None, r[1]) for r in HOSTILE_DOCS],
        "doc_id string, text string",
    )
    for df in (docs, hostile):
        a = classifier_scores(df, W, bias_milli=-5, strategy="map")
        b = classifier_scores(df, W, bias_milli=-5, strategy="join")
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb
        # same names+types; nullability legitimately differs (count()
        # results are non-nullable on the join side)
        assert [(f.name, f.dataType) for f in a.schema] == [
            (f.name, f.dataType) for f in b.schema
        ]


def test_map_strategy_is_shuffle_free(docs):
    plan = classifier_scores(docs, W, strategy="map")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_auto_picks_join_above_map_vocab_max(docs):
    big = {"t%d" % i: i for i in range(1100)}
    plan = classifier_scores(docs, big, strategy="auto")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bad_strategy_raises(docs):
    with pytest.raises(ValueError):
        classifier_scores(docs, W, strategy="rdd")


# ---------------------------------------------------------------- property
import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

_token = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.one_of(st.none(), st.lists(_token, max_size=8).map(" ".join)),
        min_size=1,
        max_size=12,
    ),
    weights=st.dictionaries(_token, st.integers(-1000, 1000), min_size=1, max_size=8),
    bias=st.integers(-500, 500),
)
def test_property_map_join_identical(spark, docs, weights, bias):
    """For ANY corpus/vocabulary/bias: the zero-shuffle map-literal plan
    and the explode+broadcast-join plan yield identical rows."""
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(docs)], "doc_id string, text string"
    )
    a = classifier_scores(df, weights, bias_milli=bias, strategy="map")
    b = classifier_scores(df, weights, bias_milli=bias, strategy="join")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_map_literal_appears_once_in_plan(docs):
    """Review regression: the vocabulary map literal must be inlined
    exactly once (lookup via transform), not once per accumulator slot."""
    plan = (
        classifier_scores(docs, W, strategy="map")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("keys: [the,data,noise,zero]") == 1
