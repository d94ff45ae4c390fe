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


# ---------------------------------------------------------------- session-15

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_equifreq_profile_invariants(spark, vals, k):
    """Pure-Python replay of the documented binning: every row of value v
    lands in bucket (count_strictly_less * k) // total + 1; per-bucket
    n/min/max must match exactly, and Σ n_rows == non-NULL count."""
    from evalidate_spark.operators.table_checks import equifreq_profile

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.bucket: (r.n_rows, r.min_v, r.max_v)
           for r in equifreq_profile(df, "v", k=k).collect()}

    live = sorted(v for v in vals if v is not None)
    want = {}
    for v in live:
        before = sum(1 for x in live if x < v)
        b = (before * k) // len(live) + 1
        n, lo, hi = want.get(b, (0, v, v))
        want[b] = (n + 1, min(lo, v), max(hi, v))
    assert got == want
    assert sum(n for n, _, _ in got.values()) == len(live)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lk=st.lists(st.one_of(st.none(), st.integers(0, 5)), min_size=0, max_size=25),
    rk=st.lists(st.one_of(st.none(), st.integers(0, 5)), min_size=0, max_size=25),
)
def test_join_fanout_equals_real_join(spark, lk, rk):
    """Σ out_rows over ALL keys == the actual inner-join row count, and
    each per-key product replays from Counters."""
    from collections import Counter

    from evalidate_spark.operators.table_checks import join_fanout

    left = spark.createDataFrame([(v,) for v in lk] or [(None,)], "k int")
    right = spark.createDataFrame([(v,) for v in rk] or [(None,)], "k int")
    rows = join_fanout(left, right, "k", top_k=1000).collect()
    cl = Counter(v for v in lk if v is not None)
    cr = Counter(v for v in rk if v is not None)
    want = {str(key): cl[key] * cr[key] for key in cl.keys() & cr.keys()}
    assert {r.key: r.out_rows for r in rows} == want
    assert sum(r.out_rows for r in rows) == left.join(right, "k").count()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=30,
    )
)
def test_pair_graph_stats_matches_bruteforce(spark, edges):
    """Triangles/wedges/closure vs a pure-Python brute force over the
    canonicalised simple graph."""
    from itertools import combinations

    from evalidate_spark.functions.dedup import pair_graph_stats

    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges] or [(None, None)],
        "id_a string, id_b string")
    r = pair_graph_stats(df).collect()[0]

    es = {tuple(sorted((str(a), str(b)))) for a, b in edges if a != b}
    nodes = {x for e in es for x in e}
    deg = {n: sum(1 for e in es if n in e) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1 for a, b, c in combinations(sorted(nodes), 3)
        if tuple(sorted((a, b))) in es
        and tuple(sorted((b, c))) in es
        and tuple(sorted((a, c))) in es
    )
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (
        len(nodes), len(es), tris, wedges)
    if wedges:
        assert r.closure_bp == 30000 * tris // wedges
    else:
        assert r.closure_bp is None
