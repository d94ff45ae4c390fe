"""span_grammar (kind-sequence regex over the interleaved spans),
join_fanout (pre-join key-multiplicity audit), pair_graph_stats
(triangle/wedge/closure shape report), equifreq_profile (equal-frequency
binning): contract tests on hand-built frames — NULL/empty handling,
exact integer math, determinism, cap semantics."""

import pytest
from pyspark.sql import Row, functions as F

from evalidate_spark.functions.dedup import pair_graph_stats
from evalidate_spark.operators.spans import span_grammar
from evalidate_spark.operators.table_checks import (
    equifreq_profile,
    join_fanout,
)


def _span(kind, offset=0):
    return Row(kind=kind, text=None, media_ref=None, offset=offset)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


class TestSpanGrammar:
    def test_signature_and_verdict(self, spark):
        df = _docs(spark, [
            ("d1", [_span("text"), _span("media"), _span("text")]),
            ("d2", [_span("media"), _span("text")]),           # opens media
            ("d3", [_span("text"), _span("media"), _span("media")]),
            ("d4", [_span("text"), _span("junk")]),            # unknown kind
        ])
        out = {r.doc_id: r for r in
               span_grammar(df, "^t[tm]*$").collect()}
        assert out["d1"].kind_sig == "tmt" and out["d1"].grammar_ok
        assert out["d2"].kind_sig == "mt" and not out["d2"].grammar_ok
        assert out["d3"].kind_sig == "tmm" and out["d3"].grammar_ok
        assert out["d3"].max_media_run == 2
        assert out["d4"].kind_sig == "t?" and not out["d4"].grammar_ok

    def test_null_and_empty_spans(self, spark):
        df = _docs(spark, [("d1", None), ("d2", [])])
        out = {r.doc_id: r for r in span_grammar(df, "^t").collect()}
        for d in ("d1", "d2"):
            assert out[d].kind_sig == ""          # never NULL
            assert out[d].n_spans == 0
            assert out[d].max_media_run == 0
            assert out[d].grammar_ok is False

    def test_null_kind_is_other_char(self, spark):
        df = _docs(spark, [("d1", [_span(None), _span("text")])])
        r = span_grammar(df, "^t[tm]*$").collect()[0]
        assert r.kind_sig == "?t" and not r.grammar_ok

    def test_unanchored_grammar_matches_anywhere(self, spark):
        df = _docs(spark, [("d1", [_span("media"), _span("text")])])
        assert span_grammar(df, "t").collect()[0].grammar_ok

    def test_media_run_at_edges(self, spark):
        df = _docs(spark, [
            ("d1", [_span("media"), _span("media"), _span("media")]),
            ("d2", [_span("text")]),
        ])
        out = {r.doc_id: r.max_media_run
               for r in span_grammar(df, "^t").collect()}
        assert out == {"d1": 3, "d2": 0}


class TestSpanTemplates:
    def test_template_mining(self, spark):
        from evalidate_spark.operators.spans import span_templates

        df = _docs(spark, [
            ("d1", [_span("text"), _span("media")]),
            ("d2", [_span("text"), _span("media")]),
            ("d3", [_span("text"), _span("media")]),
            ("d4", [_span("media"), _span("text")]),   # singleton layout
            ("d5", None),                               # NULL spans -> ''
            ("d6", []),                                 # empty spans -> ''
        ])
        rows = {r["template"]: r for r in
                span_templates(df, min_docs=2).collect()}
        # singleton 'mt' filtered; 'tm' x3 and '' x2 survive
        assert set(rows) == {"tm", ""}
        tm = rows["tm"]
        assert tm["n_docs"] == 3 and tm["example_doc_id"] == "d1"
        assert tm["share_bp"] == 3 * 10000 // 6
        empty = rows[""]
        assert empty["n_docs"] == 2 and empty["share_bp"] == 2 * 10000 // 6

        # top_k tie-break is deterministic: n_docs desc then template asc
        all_rows = span_templates(df, min_docs=1, top_k=2).collect()
        assert [r["template"] for r in all_rows] == ["tm", ""]

        import pytest as _pytest
        with _pytest.raises(ValueError):
            span_templates(df, min_docs=0)


class TestTemplateDrift:
    def test_extractor_swap_trips(self, spark):
        from evalidate_spark.operators.spans import template_drift

        # waves 0-2 emit layout 'tm'; waves 3-4 emit 'tmm' — the swap
        # boundary transition reads full TVD + full new-template share
        rows = []
        for i in range(50):
            layout = (
                [_span("text"), _span("media")] if i < 30
                else [_span("text"), _span("media"), _span("media")]
            )
            rows.append((str(i).zfill(3), layout))
        df = spark.createDataFrame(
            rows,
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        )
        # doc_id is a string here; use a numeric frame for wave slicing
        num = df.withColumn("doc_id", F.col("doc_id").cast("long"))
        out = {(r["from_wave"], r["to_wave"]): r
               for r in template_drift(num, n_waves=5).collect()}
        assert len(out) == 4
        # steady transitions: zero drift
        assert out[(0, 1)]["tvd_bp"] == 0 and out[(0, 1)]["new_templates"] == 0
        assert out[(3, 4)]["tvd_bp"] == 0
        # the swap transition (waves 2→3): total distribution change
        assert out[(2, 3)]["tvd_bp"] == 10000
        assert out[(2, 3)]["new_templates"] == 1
        assert out[(2, 3)]["new_docs_bp"] == 10000

        import pytest as _pytest
        with _pytest.raises(ValueError):
            template_drift(num, n_waves=1)

    def test_plan_has_single_tiny_unpivot(self, spark):
        # docstring promise: one template-keyed shuffle + one-aggregate
        # rollup — the ONLY Generate in the plan is the (n_waves-1)-row
        # transitions unpivot, never a corpus-row explode
        from evalidate_spark.operators.spans import template_drift

        df = _docs(spark, [
            (str(i), [_span("text"), _span("media")]) for i in range(20)
        ]).withColumn("doc_id", F.col("doc_id").cast("long"))
        plan = (
            template_drift(df, n_waves=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Generate ") == 1, plan


class TestTemplateDriftPurePython:
    def test_matches_pure_python(self, spark):
        """Third-implementation pin: wave slicing, per-template counts,
        int-bp shares, TVD halving, and new-template share replayed from
        scratch in Python must match the Spark pipeline exactly."""
        from collections import Counter

        from evalidate_spark.operators.spans import template_drift

        import random
        rnd = random.Random(9)
        layouts = [
            [_span("text")],
            [_span("text"), _span("media")],
            [_span("media"), _span("text"), _span("text")],
        ]
        rows = [(i, rnd.choice(layouts)) for i in range(41)]
        df = _docs(
            spark, [(str(i), l) for i, l in rows]
        ).withColumn("doc_id", F.col("doc_id").cast("long"))
        got = {(r["from_wave"], r["to_wave"]): r
               for r in template_drift(df, n_waves=3).collect()}

        sig = lambda l: "".join(  # noqa: E731
            "t" if sp.kind == "text" else "m" for sp in l
        )
        m = max(i for i, _ in rows) + 1
        waves = [Counter() for _ in range(3)]
        for i, l in rows:
            waves[min(2, i * 3 // m)][sig(l)] += 1
        for w in range(2):
            a, b = waves[w], waves[w + 1]
            ta, tb = sum(a.values()), sum(b.values())
            tvd = sum(
                abs(a[t] * 10000 // max(ta, 1) - b[t] * 10000 // max(tb, 1))
                for t in set(a) | set(b)
            ) // 2
            nt = sum(1 for t in b if a[t] == 0)
            no = sum(b[t] for t in b if a[t] == 0) * 10000 // max(tb, 1)
            r = got[(w, w + 1)]
            assert (r["tvd_bp"], r["new_templates"], r["new_docs_bp"]) == (
                tvd, nt, no,
            ), w


class TestTemplateSourceMatrix:
    def test_matrix_cells(self, spark):
        from evalidate_spark.operators.spans import template_source_matrix

        rows = [
            ("a", [_span("text"), _span("media")], "feedA"),
            ("b", [_span("text"), _span("media")], "feedA"),
            ("c", [_span("text")], "feedA"),           # singleton cell
            ("d", [_span("text")], "feedB"),
            ("e", [_span("text")], "feedB"),
            ("f", None, None),                          # NULL source + spans
            ("g", [], None),
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>, source string",
        )
        got = {(r["source"], r["template"]): r for r in
               template_source_matrix(df, min_docs=2).collect()}
        assert set(got) == {("feedA", "tm"), ("feedB", "t"), ("__null__", "")}
        a = got[("feedA", "tm")]
        assert a["n_docs"] == 2 and a["source_share_bp"] == 2 * 10000 // 3
        b = got[("feedB", "t")]
        assert b["n_docs"] == 2 and b["source_share_bp"] == 10000
        nul = got[("__null__", "")]
        assert nul["n_docs"] == 2 and nul["source_share_bp"] == 10000

        import pytest as _pytest
        with _pytest.raises(ValueError):
            template_source_matrix(df, min_docs=0)


class TestSpanTemplatesPurePython:
    def test_matches_pure_python(self, spark):
        """Third-implementation pin: template grouping, shares, example
        ids, and the (n_docs desc, template asc) top-k cut replayed from
        scratch in Python match the Spark pipeline exactly."""
        from collections import Counter, defaultdict
        import random

        from evalidate_spark.operators.spans import span_templates

        rnd = random.Random(17)
        layouts = [
            [_span("text")],
            [_span("text"), _span("media")],
            [_span("media")],
            [],
        ]
        rows = [("d%03d" % i, rnd.choice(layouts)) for i in range(60)]
        df = _docs(spark, rows)
        got = [(r["template"], r["n_docs"], r["share_bp"], r["example_doc_id"])
               for r in span_templates(df, min_docs=2, top_k=3).collect()]

        sig = lambda l: "".join(  # noqa: E731
            "t" if sp.kind == "text" else "m" for sp in l
        )
        counts, first = Counter(), defaultdict(lambda: "zzzz")
        for did, l in rows:
            t = sig(l)
            counts[t] += 1
            first[t] = min(first[t], did)
        total = sum(counts.values())
        want = sorted(
            ((t, c) for t, c in counts.items() if c >= 2),
            key=lambda tc: (-tc[1], tc[0]),
        )[:3]
        want = [(t, c, c * 10000 // total, first[t]) for t, c in want]
        assert sorted(got) == sorted(want)


class TestJoinFanout:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 1 + [(None,)] * 4,
            "k string")
        right = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 1 + [("d",)] * 7 + [(None,)] * 2,
            "k string")
        return left, right

    def test_products_and_share(self, spark):
        left, right = self._frames(spark)
        rows = {r.key: r for r in
                join_fanout(left, right, "k").collect()}
        # only matching non-NULL keys appear; c and d are one-sided
        assert set(rows) == {"a", "b"}
        assert (rows["a"].n_left, rows["a"].n_right, rows["a"].out_rows) \
            == (3, 5, 15)
        assert rows["b"].out_rows == 2
        # total projected output = 17
        assert rows["a"].out_share_bp == 15 * 10000 // 17
        assert rows["b"].out_share_bp == 2 * 10000 // 17
        assert rows["a"].many_to_many is True
        assert rows["b"].many_to_many is False   # n_right == 1

    def test_projection_equals_real_join(self, spark):
        left, right = self._frames(spark)
        projected = (join_fanout(left, right, "k", top_k=100)
                     .agg(F.sum("out_rows")).collect()[0][0])
        actual = left.join(right, "k").count()
        assert projected == actual

    def test_top_k_order_deterministic(self, spark):
        left = spark.createDataFrame(
            [("x",)] * 2 + [("y",)] * 2 + [("z",)] * 3, "k string")
        out = join_fanout(left, left, "k", top_k=2).collect()
        # z=9 first, then the x/y tie (4) broken key-ascending
        assert [r.key for r in out] == ["z", "x"]

    def test_different_key_names(self, spark):
        left = spark.createDataFrame([(1,)], "a long")
        right = spark.createDataFrame([(1,), (1,)], "b long")
        r = join_fanout(left, right, "a", "b").collect()[0]
        assert (r.key, r.n_left, r.n_right, r.out_rows) == ("1", 1, 2, 2)
        assert r.out_share_bp == 10000

    def test_composite_keys(self, spark):
        from evalidate_spark.operators.table_checks import join_fanout

        left = spark.createDataFrame(
            [("a", 1), ("a", 1), ("a", 2), ("a", None)],
            "k1 string, k2 int")
        right = spark.createDataFrame(
            [("a", 1), ("b", 1)], "j1 string, j2 int")
        rows = {r.key: r for r in
                join_fanout(left, right, ["k1", "k2"], ["j1", "j2"])
                .collect()}
        # only ('a',1) matches; the NULL-part row is excluded entirely
        assert list(rows) == ["a\x1f1"]
        assert (rows["a\x1f1"].n_left, rows["a\x1f1"].n_right) == (2, 1)


class TestPairGraphStats:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "id_a string, id_b string")

    def test_diamond(self, spark):
        # K4 minus edge (a,d): triangles abc + bcd, degrees a2 b3 c3 d2
        e = self._edges(spark, [
            ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")])
        r = pair_graph_stats(e).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) \
            == (4, 5, 2, 8)
        assert r.closure_bp == 30000 * 2 // 8
        assert r.n_capped_nodes == 0

    def test_dups_self_loops_reversed(self, spark):
        e = self._edges(spark, [
            ("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"), (None, "b")])
        r = pair_graph_stats(e).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) \
            == (2, 1, 0, 0)
        assert r.closure_bp is None

    def test_max_degree_cap(self, spark):
        # hub h connected to 5 leaves + one leaf-leaf edge forming a
        # triangle with the hub; cap degree 2 drops h entirely
        e = self._edges(spark, [
            ("h", x) for x in "abcde"] + [("a", "b")])
        full = pair_graph_stats(e).collect()[0]
        assert full.n_triangles == 1 and full.n_wedges == 10 + 1 + 1
        capped = pair_graph_stats(e, max_degree=2).collect()[0]
        assert capped.n_capped_nodes == 1
        assert (capped.n_nodes, capped.n_edges, capped.n_triangles) \
            == (2, 1, 0)

    def test_empty(self, spark):
        r = pair_graph_stats(
            self._edges(spark, []).filter(F.lit(False))).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) \
            == (0, 0, 0, 0)


class TestEquifreqProfile:
    def test_even_split(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(100)],
                                   "v double")
        out = equifreq_profile(df, "v", k=4).collect()
        assert [r.bucket for r in out] == [1, 2, 3, 4]
        assert all(r.n_rows == 25 for r in out)
        assert out[0].min_v == 0.0 and out[0].max_v == 24.0
        assert out[3].min_v == 75.0 and out[3].max_v == 99.0

    def test_ties_are_value_coherent(self, spark):
        # one value owns 90% of rows: all of it lands in ONE bucket
        df = spark.createDataFrame(
            [(1.0,)] * 90 + [(2.0,)] * 5 + [(3.0,)] * 5, "v double")
        out = {r.bucket: r for r in
               equifreq_profile(df, "v", k=10).collect()}
        assert out[1].n_rows == 90 and out[1].min_v == out[1].max_v == 1.0
        assert set(out) == {1, 10}  # 2.0→bucket (90*10)//100+1=10
        assert out[10].n_rows == 10

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
        out = equifreq_profile(df, "v", k=2).collect()
        assert sum(r.n_rows for r in out) == 2

    def test_k_exceeds_distinct(self, spark):
        df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        out = equifreq_profile(df, "v", k=10).collect()
        assert [(r.bucket, r.n_rows) for r in out] == [(1, 1), (6, 1)]

    def test_k_validation(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            equifreq_profile(df, "v", k=0)


class TestJsonKeyProfile:
    def _profile(self, spark, vals):
        from evalidate_spark.functions.semistructured import json_key_profile

        df = spark.createDataFrame([(v,) for v in vals], "props string")
        return {r.key: (r.n_rows, r.share_bp)
                for r in json_key_profile(df, "props").collect()}

    def test_keys_null_malformed(self, spark):
        out = self._profile(spark, [
            '{"a": 1, "b": 2}', '{"a": 3}', None, "{broken", '"scalar"',
        ])
        assert out["a"] == (2, 4000)
        assert out["b"] == (1, 2000)
        assert out["__null__"] == (1, 2000)
        # broken JSON and a non-object root both profile as malformed
        assert out["__malformed__"] == (2, 4000)

    def test_empty_object_contributes_nothing(self, spark):
        out = self._profile(spark, ["{}", '{"a": 1}'])
        assert out == {"a": (1, 5000)}


class TestRuleCooccurrence:
    def _viol(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, rule_id string")

    def test_overlap_math(self, spark):
        from evalidate_spark.operators.suggest import rule_cooccurrence

        v = self._viol(spark, [
            (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
            (1, "a"),                      # duplicate violation rows collapse
        ])
        out = {(r.rule_a, r.rule_b): r for r in
               rule_cooccurrence(v).collect()}
        ab = out[("a", "b")]
        assert (ab.n_both, ab.n_a, ab.n_b) == (2, 3, 2)
        assert ab.overlap_bp == 2 * 10000 // 3      # 2/(3+2-2)
        assert ("a", "c") not in out                # never co-fire

    def test_null_doc_rows_count_but_never_pair(self, spark):
        from evalidate_spark.operators.suggest import rule_cooccurrence

        v = self._viol(spark, [
            (None, "a"), (None, "b"), (1, "a"), (1, "b")])
        ab = rule_cooccurrence(v).collect()[0]
        # NULL-id rows raise n_a/n_b but equi-join semantics never pair
        assert (ab.n_both, ab.n_a, ab.n_b) == (1, 2, 2)
        assert ab.overlap_bp == 10000 // 3


class TestContainmentPairs:
    def test_subset_doc(self, spark):
        from evalidate_spark.functions.dedup import containment_pairs

        docs = spark.createDataFrame([
            (1, "the quick brown fox jumps"),
            (2, "a longer wrapper the quick brown fox jumps over the lazy"
                " dog tail end"),
        ], "doc_id long, text string")
        cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        r = containment_pairs(docs, cand).collect()[0]
        # every 3-shingle of doc1 appears in doc2 → full containment
        assert r.a_in_b_bp == 10000
        assert r.b_in_a_bp < 10000
        assert r.inter == r.size_a and r.size_b > r.size_a

    def test_empty_and_null_text_single_shingle(self, spark):
        from evalidate_spark.functions.dedup import containment_pairs

        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "x y z w")],
            "doc_id long, text string")
        cand = spark.createDataFrame(
            [(1, 2), (1, 3)], "id_a long, id_b long")
        out = {(r.id_a, r.id_b): r for r in
               containment_pairs(docs, cand).collect()}
        # NULL ≡ '' per the corpus shingle convention: both are the
        # single '' shingle → degenerate full mutual containment
        assert out[(1, 2)].a_in_b_bp == 10000 and out[(1, 2)].size_a == 1
        # '' shingle never occurs in a real doc's set
        assert out[(1, 3)].a_in_b_bp == 0


class TestCaptionProximity:
    def _mk(self, spark, spans_rows):
        return _docs(spark, spans_rows)

    def test_captioned_vs_orphan(self, spark):
        from evalidate_spark.operators.spans import (
            caption_proximity_violations,
        )

        df = _docs(spark, [
            # media at 10 captioned by text at 0 (distance 10)
            ("d1", [Row(kind="text", text="w", media_ref=None, offset=0),
                    Row(kind="media", text=None, media_ref="m", offset=10)]),
            # media at 100, nearest text at 0 → orphan
            ("d2", [Row(kind="text", text="w", media_ref=None, offset=0),
                    Row(kind="media", text=None, media_ref="m", offset=100)]),
        ])
        out = caption_proximity_violations(df, max_distance=10).collect()
        assert [(r.doc_id, r.span_index, r.offset) for r in out] \
            == [("d2", 1, 100)]

    def test_null_offsets_and_empty_text(self, spark):
        from evalidate_spark.operators.spans import (
            caption_proximity_violations,
        )

        df = _docs(spark, [
            # media offset NULL → always orphan
            ("d1", [Row(kind="text", text="w", media_ref=None, offset=0),
                    Row(kind="media", text=None, media_ref="m", offset=None)]),
            # only caption candidate has NULL text → doesn't caption
            ("d2", [Row(kind="text", text=None, media_ref=None, offset=10),
                    Row(kind="media", text=None, media_ref="m", offset=10)]),
            # NULL spans → no rows
            ("d3", None),
        ])
        out = {(r.doc_id, r.span_index) for r in
               caption_proximity_violations(df, max_distance=10).collect()}
        assert out == {("d1", 1), ("d2", 1)}


class TestCentroidSilhouette:
    def test_crisp_boundary_and_single_centroid(self, spark):
        from evalidate_spark.functions.similarity import centroid_silhouette

        cents = spark.createDataFrame(
            [(100, [1.0, 0.0]), (200, [0.0, 1.0])],
            "vec_id long, embedding array<double>")
        vecs = spark.createDataFrame([
            (1, [1.0, 0.0]),          # exactly centroid 100
            (2, [1.0, 1.0]),          # equidistant boundary
            (3, None),                # excluded
            (4, [1.0, 0.0, 0.0]),     # wrong dim, excluded
        ], "vec_id long, embedding array<double>")
        out = {r.vec_id: r for r in
               centroid_silhouette(vecs, cents, dim=2).collect()}
        assert set(out) == {1, 2}
        assert out[1].cluster_id == 100 and out[1].cos_own == 1.0
        assert out[1].silhouette == 1.0
        # boundary: equal cosine both sides → id tiebreak, silhouette 0
        assert out[2].cluster_id == 100 and out[2].silhouette == 0.0

        solo = centroid_silhouette(
            vecs, cents.filter(F.col("vec_id") == 100), dim=2).collect()
        assert all(r.silhouette is None for r in solo)

    def test_negative_silhouette_needs_three(self, spark):
        from evalidate_spark.functions.similarity import centroid_silhouette

        # assignment picks the best centroid by construction, so
        # silhouette < 0 can't happen — verify ordering instead
        cents = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.7071067811865476, 0.7071067811865476])],
            "vec_id long, embedding array<double>")
        vecs = spark.createDataFrame(
            [(10, [0.9, 0.1])], "vec_id long, embedding array<double>")
        r = centroid_silhouette(vecs, cents, dim=2).collect()[0]
        assert r.cluster_id == 1 and r.cos_own >= r.cos_next
        assert 0.0 <= r.silhouette <= 1.0


class TestMagnitudeProfile:
    def test_digit_buckets(self, spark):
        from evalidate_spark.operators.table_checks import magnitude_profile

        df = spark.createDataFrame(
            [(0.5,), (9.6,), (10.0,), (999.0,), (-42.0,), (None,)],
            "v double")
        out = {(r.digits, r.negative): (r.n_rows, r.share_bp)
               for r in magnitude_profile(df, "v").collect()}
        # 9.6 truncates to 9 → ONE digit (decimal cast would round to 10)
        assert out[(1, False)] == (1, 2000)
        assert out[(0, False)] == (1, 2000)
        assert out[(2, False)] == (1, 2000)   # 10.0
        assert out[(3, False)] == (1, 2000)   # 999
        assert out[(2, True)] == (1, 2000)    # -42
        assert sum(n for n, _ in out.values()) == 5


class TestTsGranularity:
    def test_mixed_precisions(self, spark):
        from evalidate_spark.operators.table_checks import ts_granularity

        df = spark.createDataFrame(
            [("2026-01-01 00:00:00",),       # midnight
             ("2026-01-01 10:30:00",),       # zero-second
             ("2026-01-01 10:30:05",),       # zero-micros only
             ("2026-01-01 10:30:05.123456",),
             (None,)],
            "s string").selectExpr("cast(s as timestamp) ts")
        r = ts_granularity(df, "ts").collect()[0]
        assert r.n_rows == 4
        assert (r.n_midnight, r.n_zero_second, r.n_zero_micros) == (1, 2, 3)
        assert r.midnight_bp == 2500
        assert r.zero_second_bp == 5000
        assert r.zero_micros_bp == 7500

    def test_ntz_column(self, spark):
        from evalidate_spark.operators.table_checks import ts_granularity

        df = spark.createDataFrame(
            [("2026-01-01 00:00:00",), ("2026-01-01 01:02:03",)],
            "s string").selectExpr("cast(s as timestamp_ntz) ts")
        r = ts_granularity(df, "ts").collect()[0]
        assert (r.n_rows, r.n_midnight) == (2, 1)


class TestPlanShapes:
    def test_span_grammar_no_exchange(self, spark):
        from evalidate_spark.operators.spans import span_grammar

        df = _docs(spark, [("d1", [_span("text")])])
        plan = (span_grammar(df, "^t")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan     # one fused projection, no shuffle

    def test_caption_check_no_exchange(self, spark):
        from evalidate_spark.operators.spans import (
            caption_proximity_violations,
        )

        df = _docs(spark, [("d1", [_span("media")])])
        plan = (caption_proximity_violations(df, 10)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan

    def test_join_fanout_joins_aggregates_not_rows(self, spark):
        from evalidate_spark.operators.table_checks import join_fanout

        left = spark.createDataFrame([("a",)] * 8, "k string")
        plan = (join_fanout(left, left, "k")
                ._jdf.queryExecution().optimizedPlan().toString())
        # both join inputs must already be Aggregates: the key histograms
        # join, the audited row-level join never appears in the plan
        import re
        first_join = plan.find("Join")
        agg_before = [m.start() for m in re.finditer("Aggregate", plan)]
        assert first_join != -1
        assert sum(1 for a in agg_before if a > first_join) >= 2


class TestSchemaConformance:
    def test_all_statuses(self, spark):
        from evalidate_spark.operators.table_checks import schema_conformance

        df = spark.createDataFrame(
            [], "a bigint, b string, extra array<struct<k:string>>")
        out = {r.column: (r.expected_type, r.actual_type, r.status)
               for r in schema_conformance(
                   df, {"a": "bigint", "b": "int", "gone": "double"}
               ).collect()}
        assert out["a"] == ("bigint", "bigint", "ok")
        assert out["b"] == ("int", "string", "type_mismatch")
        assert out["gone"] == ("double", None, "missing")
        # nested types compare structurally via simpleString
        assert out["extra"] == (None, "array<struct<k:string>>", "unexpected")

    def test_non_strict_allows_additive(self, spark):
        from evalidate_spark.operators.table_checks import schema_conformance

        df = spark.createDataFrame([], "a bigint, extra string")
        out = schema_conformance(df, {"a": "bigint"}, strict=False).collect()
        assert [(r.column, r.status) for r in out] == [("a", "ok")]


class TestRuleDrift:
    def _v(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, rule_id string")

    def test_rates_and_new_silenced_rules(self, spark):
        from evalidate_spark.operators.suggest import rule_drift

        base = self._v(spark, [(1, "a"), (2, "a"), (3, "old")])
        cur = self._v(spark, [(1, "a"), (2, "a"), (3, "a"), (4, "a"),
                              (5, "new"), (5, "new")])
        out = {r.rule_id: r for r in
               rule_drift(base, cur, base_rows=10, cur_rows=10,
                          alert_bp=1500).collect()}
        a = out["a"]
        assert (a.base_docs, a.cur_docs) == (2, 4)
        assert (a.base_rate_bp, a.cur_rate_bp, a.delta_bp) == (2000, 4000, 2000)
        assert a.alert is True
        # "new" fires twice on the SAME doc → distinct-doc rate, one doc
        assert (out["new"].base_rate_bp, out["new"].cur_rate_bp) == (0, 1000)
        assert out["new"].alert is False   # |1000| < 1500
        assert (out["old"].cur_docs, out["old"].delta_bp) == (0, -1000)
        assert out["old"].alert is False   # |delta| < 1500

    def test_requires_row_counts(self, spark):
        from evalidate_spark.operators.suggest import rule_drift

        v = self._v(spark, [(1, "a")])
        with pytest.raises(ValueError):
            rule_drift(v, v)


class TestClassBalance:
    def test_weights_and_null_label(self, spark):
        from evalidate_spark.functions.classifier import class_balance

        df = spark.createDataFrame(
            [(0,)] * 90 + [(1,)] * 10 + [(None,)] * 5, "label int")
        out = {r.label: r for r in class_balance(df, "label").collect()}
        # labeled=100, k=2: weight(0) = 100*10000//(2*90), weight(1) = ..//20
        assert out[0].weight_scaled == 1000000 // 180
        assert out[1].weight_scaled == 1000000 // 20
        assert out[None].weight_scaled is None
        assert out[None].n_rows == 5 and out[None].share_bp == 5 * 10000 // 105
        assert out[0].share_bp == 90 * 10000 // 105


class TestLshThresholdHist:
    def test_exact_integer_binning(self, spark):
        from evalidate_spark.functions.dedup import lsh_threshold_hist

        docs = spark.createDataFrame([
            (1, "a b c d e"),          # 3 shingles
            (2, "a b c d e"),          # identical → J=1 → bin 19
            (3, "a b c x y"),          # 1 of 5 union-3-shingles shared
            (4, "zz zz zz"),           # disjoint → J=0 → bin 0
        ], "doc_id long, text string")
        cand = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
        out = {r.bin: (r.lo_bp, r.n_pairs) for r in
               lsh_threshold_hist(docs, cand, bins=20).collect()}
        assert out[19] == (9500, 1)     # J = 1.0 capped into the top bin
        assert out[0] == (0, 1)         # disjoint
        # (1,3): inter=1, union=5 → (1*20)//5 = 4
        assert out[4] == (2000, 1)

    def test_bins_validation(self, spark):
        from evalidate_spark.functions.dedup import lsh_threshold_hist

        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        cand = spark.createDataFrame([(1, 1)], "id_a long, id_b long")
        with pytest.raises(ValueError):
            lsh_threshold_hist(docs, cand, bins=7)   # doesn't divide 10000


class TestCategoryChurn:
    def test_statuses_null_and_debounce(self, spark):
        from evalidate_spark.operators.table_checks import category_churn

        base = spark.createDataFrame(
            [("a",)] * 3 + [("gone",)] * 2 + [(None,)] * 2, "c string")
        cur = spark.createDataFrame(
            [("a",)] * 4 + [("new",)] * 2 + [(None,)] * 1 + [("flicker",)],
            "c string")
        out = {r.category: (r.base_rows, r.cur_rows, r.status)
               for r in category_churn(base, cur, "c", min_rows=2).collect()}
        assert out["a"] == (3, 4, "persists")
        assert out["gone"] == (2, 0, "gone")
        assert out["new"] == (0, 2, "new")
        # NULL pairs with itself via null-safe equality
        assert out[None] == (2, 0, "gone")   # cur NULL count 1 < min_rows
        assert "flicker" not in out          # debounced per side


class TestDedupVerdicts:
    def test_priority_order(self, spark):
        from evalidate_spark.functions.dedup import dedup_verdicts

        docs = spark.createDataFrame([
            (1, "The  Quick brown FOX jumps high"),
            (2, "the quick brown fox jumps high"),     # exact (case/ws)
            (3, "a b c d e f g h i j k l"),
            (4, "a b c d e f g h i j k m"),   # near: 9/11 shingles shared
            (5, "x y z w"),
            (6, "pre x y z w post tail more words here pad pad pad"),  # contained
            (7, "alpha beta gamma"),
            (8, "totally different words entirely"),   # distinct
        ], "doc_id long, text string")
        cand = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a long, id_b long")
        out = {(r.id_a, r.id_b): r for r in
               dedup_verdicts(docs, cand).collect()}
        assert out[(1, 2)].decision == "exact" and out[(1, 2)].exact
        assert out[(3, 4)].decision == "near"
        assert out[(3, 4)].jaccard_bp >= 8000 and not out[(3, 4)].exact
        assert out[(5, 6)].decision == "contained"
        assert out[(5, 6)].a_in_b_bp == 10000
        assert out[(7, 8)].decision == "distinct"

    def test_null_fingerprint_never_exact(self, spark):
        from evalidate_spark.functions.dedup import dedup_verdicts

        docs = spark.createDataFrame(
            [(1, None), (2, None)], "doc_id long, text string")
        cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        r = dedup_verdicts(docs, cand).collect()[0]
        # both NULL texts: fingerprints NULL → not exact; the single ''
        # shingle sets ARE identical → jaccard 10000 → near
        assert r.exact is False and r.decision == "near"


class TestSpanOverlap:
    def _doc(self, spark, spans):
        return spark.createDataFrame(
            [("d1", spans)],
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>")

    def test_text_extent_overlap(self, spark):
        from evalidate_spark.operators.spans import span_overlap_violations

        df = self._doc(spark, [
            Row(kind="text", text="hello", media_ref=None, offset=0),
            Row(kind="media", text=None, media_ref="m", offset=3),  # inside
            Row(kind="text", text="x", media_ref=None, offset=5),
        ])
        out = span_overlap_violations(df).collect()
        # text[0,5) overlaps the media at 3; media occupies one position
        # (len 0) so (media@3, text@5) is fine
        assert [(r.span_index, r.end_prev, r.offset_next) for r in out] \
            == [(0, 5, 3)]

    def test_sorted_not_ingest_order(self, spark):
        from evalidate_spark.operators.spans import span_overlap_violations

        # ingest order reversed: the check must sort by offset first
        df = self._doc(spark, [
            Row(kind="text", text="x", media_ref=None, offset=10),
            Row(kind="text", text="longtext", media_ref=None, offset=4),
        ])
        out = span_overlap_violations(df).collect()
        # sorted: (4,len 8) ends at 12 > 10 → violation at ORIGINAL ix 1
        assert [(r.span_index, r.end_prev, r.offset_next) for r in out] \
            == [(1, 12, 10)]

    def test_null_offsets_excluded(self, spark):
        from evalidate_spark.operators.spans import span_overlap_violations

        df = self._doc(spark, [
            Row(kind="text", text="hello", media_ref=None, offset=None),
            Row(kind="text", text="world", media_ref=None, offset=0),
        ])
        assert span_overlap_violations(df).collect() == []


class TestAggregateChecks:
    def test_pass_fail_and_null_fails(self, spark):
        from evalidate_spark.operators.table_checks import aggregate_checks

        df = spark.createDataFrame([(1.0,), (3.0,), (None,)], "v double")
        out = {r.check_id: (r.passed, r.status) for r in
               aggregate_checks(df, {
                   "avg_ok": "avg(v) BETWEEN 1 AND 3",
                   "rows_ok": "count(*) >= 10",
                   # aggregate over zero matching rows → NULL → fail
                   "null_check": "max(CASE WHEN v > 100 THEN v END) > 0",
               }).collect()}
        assert out["avg_ok"] == (True, "pass")
        assert out["rows_ok"] == (False, "fail")
        assert out["null_check"] == (False, "fail")

    def test_empty_checks_rejected(self, spark):
        from evalidate_spark.operators.table_checks import aggregate_checks

        with pytest.raises(ValueError):
            aggregate_checks(spark.range(1), {})


class TestSampleFidelity:
    def test_perfect_and_skewed(self, spark):
        from evalidate_spark.operators.table_checks import sample_fidelity

        pop = spark.createDataFrame(
            [(float(i % 10),) for i in range(100)], "v double")
        # perfect stratified half-sample: same distribution
        good = spark.createDataFrame(
            [(float(i % 10),) for i in range(50)], "v double")
        out = sample_fidelity(pop, good, "v", bins=10).collect()
        assert all(r.diff_bp == 0 and not r.skewed for r in out)
        # a sample of only small values: low buckets over, high missing
        bad = spark.createDataFrame([(0.0,)] * 10 + [(1.0,)] * 10,
                                    "v double")
        out2 = {r.bucket: r for r in
                sample_fidelity(pop, bad, "v", bins=10).collect()}
        assert out2[0].skewed and out2[0].diff_bp > 0
        assert out2[9].samp_n == 0 and out2[9].skewed

    def test_degenerate_bounds(self, spark):
        from evalidate_spark.operators.table_checks import sample_fidelity

        pop = spark.createDataFrame([(5.0,)] * 4, "v double")
        out = sample_fidelity(pop, pop.limit(2), "v").collect()
        assert len(out) == 1 and out[0].bucket == 0 and out[0].diff_bp == 0


class TestCategoricalFidelity:
    def test_share_diff_and_null_category(self, spark):
        from evalidate_spark.operators.table_checks import (
            categorical_fidelity,
        )

        pop = spark.createDataFrame(
            [("a",)] * 50 + [("b",)] * 40 + [(None,)] * 10, "c string")
        samp = spark.createDataFrame(
            [("a",)] * 45 + [("b",)] * 4 + [(None,)] * 1, "c string")
        out = {r.category: r for r in
               categorical_fidelity(pop, samp, "c", max_diff_bp=500)
               .collect()}
        assert out["a"].pop_share_bp == 5000
        assert out["a"].samp_share_bp == 9000 and out["a"].skewed
        assert out["b"].diff_bp == 800 - 4000
        assert out[None].pop_n == 10 and out[None].samp_n == 1
