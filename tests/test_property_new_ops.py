"""Property-based invariants for the session-9 per-row text operators:

1. repetition_signals ≡ a pure-Python replay of the documented contract
   (whitespace tokens, max-coverage top n-gram, dup n-gram coverage,
   IEEE floor-bp with clamp) under arbitrary token soups.
2. value_shapes' shape mapping ≡ a pure-Python re chain (same step
   order, run collapse, 32-char cap, NULL/empty sentinels).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from evalidate_spark.functions import text
from evalidate_spark.operators.table_checks import (
    _SHAPE_MAXLEN,
    _SHAPE_STEPS,
    value_shapes,
)

# small alphabet + repetition-prone structure so duplicate grams are common
TOKEN = st.sampled_from(["a", "bb", "ccc", "x1", "Z", "aa-b"])
SEP = st.sampled_from([" ", "  ", "\t", " \t "])


@st.composite
def soup(draw):
    toks = draw(st.lists(TOKEN, min_size=0, max_size=14))
    if not toks:
        return draw(st.sampled_from([None, "", "   "]))
    seps = [draw(SEP) for _ in toks]
    return "".join(t + s for t, s in zip(toks, seps)).rstrip(
        draw(st.sampled_from(["", " "]))
    )


def ref_repetition(t, top_ns=(2, 3), dup_n=5):
    if t is None:
        return (None,) * (len(top_ns) + 1)
    toks = [x for x in re.split(r"\s+", t) if x]
    norm = len(" ".join(toks))

    def grams(n):
        if len(toks) < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    def bp(chars):
        if norm <= 0:
            return 0
        return min(10000, math.floor(10000.0 * chars / norm))

    out = []
    for n in top_ns:
        c = Counter(grams(n))
        out.append(bp(max((k * len(g) for g, k in c.items()), default=0)))
    c = Counter(grams(dup_n))
    out.append(bp(sum(k * len(g) for g, k in c.items() if k > 1)))
    return tuple(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(soup(), min_size=1, max_size=20))
def test_repetition_signals_matches_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.top2_bp, r.top3_bp, r.dup5_bp)
        for r in text.repetition_signals(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_repetition(t), (i, t)


def ref_shape(v):
    if v is None:
        return "<null>"
    s = v
    for pat, rep in _SHAPE_STEPS:
        s = re.sub(pat, rep.replace("+", r"+"), s)
    s = s[:_SHAPE_MAXLEN]
    return "<empty>" if s == "" else s


SHAPE_CHARS = st.text(
    alphabet="aZ09 _-.!~éЖ中", min_size=0, max_size=40
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(st.one_of(st.none(), SHAPE_CHARS), min_size=1, max_size=25))
def test_value_shapes_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "a string")
    got = Counter(
        dict(
            (r.shape, r.n)
            for r in value_shapes(df, ["a"], top_k=1000).collect()
        )
    )
    want = Counter(ref_shape(v) for v in vals)
    assert got == want
