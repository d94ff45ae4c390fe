"""Property-based invariants for the session-6 check surface:

1. check_expressions ⇄ expression_violations consistency — for random
   tables and predicates, the summary's n_failed per check must equal the
   number of violation rows that check emits, and pass_bp must be the
   exact int arithmetic of those counts.
2. sequence_anomalies ≡ a pure-Python simulation of the documented
   contract (sort by (seq, ts) per entity, one anomaly per adjacency,
   dup > regression > gap priority, NULL exclusion).
3. ssjoin_pairs ≡ brute-force all-pairs Jaccard on random small corpora —
   the zero-false-negative prefix bound under arbitrary shapes.
"""

from __future__ import annotations

import itertools
import math

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from evalidate_spark.functions import dedup
from evalidate_spark.operators.sessions import sequence_anomalies
from evalidate_spark.operators.table_checks import (
    check_expressions,
    expression_violations,
)

PREDS = {
    "qty_small": "qty < 30",
    "flag_ab": "flag IN ('a', 'b')",
    "cross": "qty >= n",
    "n_pos": "n > 0",
}

ROW = st.fixed_dictionaries(
    {
        "id": st.integers(0, 10_000),
        "qty": st.sampled_from([None, 0.0, 10.0, 29.999, 30.0, 99.5]),
        "flag": st.sampled_from([None, "", "a", "b", "z"]),
        "n": st.sampled_from([None, -3, 0, 1, 50]),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(ROW, min_size=0, max_size=25))
def test_summary_matches_violation_rows(spark, rows):
    df = spark.createDataFrame(
        [(r["id"], r["qty"], r["flag"], r["n"]) for r in rows],
        "id long, qty double, flag string, n long",
    )
    summary = {
        r["check_id"]: r for r in check_expressions(df, PREDS).collect()
    }
    from collections import Counter

    vio = Counter(
        r["check_id"]
        for r in expression_violations(df, PREDS, ["id"]).collect()
    )
    assert set(summary) == set(PREDS)
    for cid in PREDS:
        s = summary[cid]
        assert s["n_rows"] == len(rows)
        assert s["n_failed"] == vio.get(cid, 0)
        want_bp = (
            10000
            if s["n_rows"] == 0
            else (s["n_rows"] - s["n_failed"]) * 10000 // s["n_rows"]
        )
        assert s["pass_bp"] == want_bp
        assert s["status"] == ("pass" if s["n_failed"] == 0 else "fail")


EVENT = st.tuples(
    st.sampled_from([None, 1, 2]),              # entity
    st.sampled_from([None, 1, 2, 3, 4]),        # seq
    st.sampled_from([None, 0, 30, 60, 90, 7200]),  # ts seconds
)


def _py_sequence_anomalies(events, max_gap_us):
    out = []
    by_ent = {}
    for e, s, t in events:
        if e is None or s is None or t is None:
            continue
        by_ent.setdefault(e, []).append((s, t * 1_000_000))
    for e, evs in by_ent.items():
        evs.sort()
        for (ps, pt), (s, t) in zip(evs, evs[1:]):
            if s == ps:
                out.append((e, s, "duplicate_seq", t - pt))
            elif pt > t:
                out.append((e, s, "ts_regression", pt - t))
            elif max_gap_us is not None and t - pt > max_gap_us:
                out.append((e, s, "gap", t - pt))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=0, max_size=20),
    gap_s=st.sampled_from([None, 45, 3600]),
)
def test_sequence_anomalies_matches_python_sim(spark, events, gap_s):
    df = spark.createDataFrame(
        [
            (
                e,
                s,
                None if t is None else f"2026-01-01 00:00:00",
                0 if t is None else t,
            )
            for e, s, t in events
        ],
        "user_id long, event_id long, base string, off long",
    ).selectExpr(
        "user_id",
        "event_id",
        "cast(base as timestamp) + make_interval(0,0,0,0,0,0,off) AS ts",
    )
    got = sorted(
        tuple(r)
        for r in sequence_anomalies(
            df,
            max_gap_us=None if gap_s is None else gap_s * 1_000_000,
        ).collect()
    )
    want = _py_sequence_anomalies(
        events, None if gap_s is None else gap_s * 1_000_000
    )
    assert got == want


def _shingles(text, k=3):
    t = text.split()
    return {" ".join(t[i : i + k]) for i in range(max(len(t) - k + 1, 1))}


TOKEN = st.sampled_from(["aa", "bb", "cc", "dd"])
TEXT = st.lists(TOKEN, min_size=1, max_size=8).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(TEXT, min_size=2, max_size=10),
    thr=st.sampled_from([0.5, 0.75, 0.8, 1.0]),
)
def test_ssjoin_matches_bruteforce(spark, texts, thr):
    docs = [(f"d{i:02d}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ssjoin_pairs(df, threshold=thr).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        a, b = _shingles(ta), _shingles(tb)
        j = len(a & b) / len(a | b)
        if j >= thr:
            want[(ia, ib)] = j
    assert set(got) == set(want)
    for p, j in want.items():
        assert math.isclose(got[p], round(j, 6), abs_tol=1e-6)
