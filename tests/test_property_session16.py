"""Property-based invariants for the session-16 corpus operators:
full pure-Python replays of the documented contracts under arbitrary
small corpora (duplicate-prone token soups, NULL/empty texts, NULL ids,
negative ids).

Each example runs one Spark job, so example counts stay small; the
replays are complete (not spot checks), so any divergence in ordering,
NULL handling, flooring, or bucketing fails loudly.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from evalidate_spark.functions import dedup, text

TOKEN = st.sampled_from(["a", "bb", "ccc", "dup", "x1", "Z"])


@st.composite
def corpus(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    rows = []
    used_ids = set()
    for i in range(n):
        has_id = draw(st.booleans()) or draw(st.booleans())  # mostly ids
        if has_id:
            did = draw(st.integers(min_value=-3, max_value=30))
            while did in used_ids:
                did += 1
            used_ids.add(did)
        else:
            did = None
        kind = draw(st.integers(min_value=0, max_value=4))
        if kind == 0:
            txt = None
        elif kind == 1:
            txt = ""
        else:
            toks = draw(st.lists(TOKEN, min_size=1, max_size=6))
            txt = " ".join(toks)
        rows.append((did, txt, "en", "s", draw(st.integers(0, 50))))
    return rows


def _toks(t):
    return [x for x in re.split(r"\s+", t) if x]


def _fp(t):
    import hashlib

    return hashlib.md5(
        " ".join(x.lower() for x in _toks(t)).encode()
    ).hexdigest()


SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=corpus())
@SETTINGS
def test_snm_pairs_matches_python_replay(spark, rows):
    df = spark.createDataFrame(
        rows or [(None, None, None, None, None)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    if not rows:
        df = df.filter("doc_id IS NOT NULL")  # empty frame, typed
    got = {
        (r.id_a, r.id_b): (r.block, r.gap, r.jaccard_bp, r.is_near)
        for r in dedup.snm_pairs(df, window=2, block_chars=2,
                                 key_chars=16).collect()
    }

    # replay: normalised key, 2-char block, rank by (key, id), window 2
    cand = []
    for did, txt, *_ in rows:
        if did is None or txt is None:
            continue
        norm = " ".join(x.lower() for x in _toks(txt))
        cand.append((norm[:2], norm[:16], did,
                     set(x.lower() for x in _toks(txt))))
    blocks = defaultdict(list)
    for b, k, i, tk in cand:
        blocks[b].append((k, i, tk))
    want = {}
    for b, members in blocks.items():
        members.sort(key=lambda m: (m[0], m[1]))
        for ix, (_, ia, ta) in enumerate(members):
            for gap in (1, 2):
                if ix + gap >= len(members):
                    break
                _, ib, tb = members[ix + gap]
                inter = len(ta & tb)
                union = len(ta) + len(tb) - inter
                bp = 10000 if union == 0 else inter * 10000 // union
                want[(ia, ib)] = (b, gap, bp, bp >= 8000)
    assert got == want


@given(rows=corpus())
@SETTINGS
def test_dup_inflation_matches_python_replay(spark, rows):
    df = spark.createDataFrame(
        rows or [(None, None, None, None, None)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    if not rows:
        df = df.filter("doc_id IS NOT NULL")
    got = {
        r.multiplicity: (r.n_groups, r.n_docs, r.weight, r.weight_share_bp,
                         r.excess_weight)
        for r in dedup.dup_inflation(df).collect()
    }

    groups = defaultdict(list)  # fp -> [(id, w)]
    for did, txt, _l, _s, w in rows:
        if did is None or txt is None:
            continue
        groups[_fp(txt)].append((did, w or 0))
    buckets = defaultdict(lambda: [0, 0, 0, 0])  # groups, docs, w, excess
    for members in groups.values():
        m = len(members)
        lab = "1" if m == 1 else "2" if m == 2 else "3-10" if m <= 10 else ">10"
        gw = sum(w for _, w in members)
        sw = min(members)[1]  # weight of the min-id member
        b = buckets[lab]
        b[0] += 1
        b[1] += m
        b[2] += gw
        b[3] += gw - sw
    total = sum(b[2] for b in buckets.values())
    want = {
        lab: (b[0], b[1], b[2], b[2] * 10000 // max(total, 1), b[3])
        for lab, b in buckets.items()
    }
    assert got == want


@given(rows=corpus())
@SETTINGS
def test_novelty_trend_matches_python_replay(spark, rows):
    df = spark.createDataFrame(
        rows or [(None, None, None, None, None)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    if not rows:
        df = df.filter("doc_id IS NOT NULL")
    got = {
        r.bucket: (r.n_docs, r.n_repeats, r.repeat_bp)
        for r in dedup.novelty_trend(df, n_buckets=5).collect()
    }

    docs = [(did, txt) for did, txt, *_ in rows if did is not None]
    if not docs:
        assert got == {}
        return
    mx = max(1, max(max(d, 0) for d, _ in docs) + 1)
    first = {}
    for did, txt in docs:
        if txt is None:
            continue
        fp = _fp(txt)
        if fp not in first or did < first[fp]:
            first[fp] = did
    per = defaultdict(lambda: [0, 0])
    for did, txt in docs:
        b = min(4, max(did, 0) * 5 // mx)
        per[b][0] += 1
        if txt is not None and did > first[_fp(txt)]:
            per[b][1] += 1
    want = {b: (n, r, r * 10000 // n) for b, (n, r) in per.items()}
    assert got == want
