"""Adversarial oracle-parity gate: every oracled driver query (QUERIES
below; kept in lockstep with ``oracle_sql()``) — the whole oracled
surface over documents/events/lineitem/supplier/embeddings/part/nation/
region — must
hash-match their DuckDB oracles on HOSTILE tables: NULL texts/ids/
timestamps/users/keys/measures/labels/vectors, empty and multi-space
texts, duplicate texts and vectors, zero/short/long vectors, invalid
enum and regex values.

The shipped testdata contains none of these, so the standard correctness
gate can't see NULL/whitespace contract divergences (review rounds found
a dozen before this gate existed).  This test replays the driver's
compare (sorted columns, canonicalised rows, sha256) on the synthetic
corpus; use scripts/hostile_probe.py to diff a failing query row-wise."""

import hashlib
import os

import duckdb
import pytest

import __spark_entry__ as entry

QUERIES = [
    "dedup_corpus",
    "dedup_attrition",
    "near_dedup_attrition",
    "minhash_dedup_attrition",
    "exact_dup_groups",
    "contamination",
    "pii_redaction",
    "boilerplate_removal",
    "corpus_report",
    "quality_topk",
    "quality_documents",
    "gopher_rules",
    "filter_funnel",
    "c4_filters",
    "filter_agreement",
    "classifier_scores",
    "classifier_auc",
    "chunked_docs",
    "fingerprint_documents",
    "token_counts",
    "sampled_docs",
    "stratified_sample",
    "shard_plan",
    "file_health",
    "violation_examples",
    "freshness",
    "domain_caps",
    "incremental_dedup",
    "mixture_rebalance",
    "corpus_diff",
    "normalized_docs",
    "packed_sequences",
    "budget_selection",
    "leakage_split",
    "multiway_split",
    "weighted_sample",
    "inclusion_deps",
    "correlation_matrix",
    "lm_scores",
    "minhash_pairs_md5",
    "simhash_pairs_md5",
    # construction-oracled media queries: read no corpus tables (synth
    # media only), included to keep QUERIES ≡ oracle_sql() lockstep
    "media_dims",
    "media_format_check",
    "video_frame_grid",
    "image_near_dups",
    "audio_near_dups",
    "video_near_dups",
    "embedding_health",
    "embedding_health_trend",
    "repetition_signals",
    "script_mix",
    "rate_anomalies",
    "jsonschema_validate",
    "group_completeness",
    "value_shapes",
    "k_anonymity",
    "dup_cluster_sizes",
    "lang_agreement",
    "line_dedup",
    "span_text_quality",
    "incremental_minhash",
    "lsh_recall",
    "top_ngrams",
    "tfidf_terms",
    "bm25_topk",
    "lang_marker_counts",
    "token_counts_bpe",
    "jaccard_pairs",
    "zorder_events",
    "sessions",
    "suppress_repeats",
    "table_diff",
    "reconcile_totals",
    "changelog_compact",
    "survivorship",
    "promo_attribution",
    "funnel",
    "cohort_retention",
    "trailing_features",
    "asof_features",
    "histogram_events_value",
    "uniqueness_events_user",
    "drift_events",
    "drift_event_types",
    "uniqueness_composite",
    "iqr_outliers",
    "mad_outliers",
    "column_fingerprints",
    "functional_deps",
    "skew_report",
    "encoding_anomalies",
    "quantile_states",
    "corpus_overlap",
    "resolve_duplicates",
    "profile_anomalies",
    "html_extract",
    # validation-engine surface (oracles model full NULL presence semantics)
    "validate_documents",
    "clean_documents",
    "optional_default",
    "deprecated_keys",
    "rule_or",
    "rule_and_on_error",
    "lib_validators",
    "converters",
    "bare_values",
    "zipped_rulesets",
    "nested_childs",
    "password",
    "custom_validator",
    # embeddings surface (NULL ids/labels/vectors, zero/short/long vectors)
    "ann_topk",
    "ivf_topk",
    "quantized_topk",
    "centroid_outliers",
    "embedding_near_dups",
    "semantic_dedup",
    # lineitem/supplier surface (NULL keys, measures, dates)
    "profile_lineitem",
    "profile_quantiles",
    "drift_quantile",
    "referential_lineitem_supplier",
    "referential_bloom",
    "winsorize_quantity",
    "check_suite",
    "suggested_constraints",
    "profile_incremental",
    # spans surface (NULL text/id/n_chars flow through the derived spans)
    "span_structure",
    "span_refs_dangling",
    "span_reconstruct",
    # lineage / coverage roll-ups
    "partition_verdicts",
    "rule_firing_stats",
    "ngram_dup_spans",
    "canonical_urls",
    "dup_clusters",
    # part/nation/region surface (NULL per rule branch; NULL join keys)
    "validate_part",
    "fuzzy_matches",
    "cooccurring_pairs",
    "readability",
    "association_rules",
    "nation_region_rollup",
    "ssjoin_pairs",
    "column_entropy",
    "check_expressions",
    "expression_violations",
    "sequence_anomalies",
    "group_drift",
    "hotkey_topk",
    "cardinality_suppliers",
    "uniqueness_incremental",
    "null_correlation",
    "mutual_information",
    "benford",
    "rolling_actives",
    "scd2_history",
    "gap_profile",
    "calibration",
    "rate_changepoints",
    "completeness_trend",
    "fuzzy_links",
    "order_islands",
    "resampled_values",
    "source_concentration",
    "label_noise",
    "transitions",
    "pair_degrees",
    "l_diversity",
    "window_overlaps",
    "corpus_rollup",
    "lang_matrix",
    "seasonal_anomalies",
    "props_extract",
    "span_grammar",
    "props_keys",
    "rule_cooccurrence",
    "containment_pairs",
    "caption_check",
    "cluster_silhouette",
    "magnitude_profile",
    "ts_granularity",
    "schema_conformance",
    "rule_drift",
    "class_balance",
    "lsh_threshold_hist",
    "category_churn",
    "media_reuse",
    "dedup_verdicts",
    "span_overlap",
    "aggregate_checks",
    "sample_fidelity",
    "dedup_cell_fidelity",
    "join_fanout",
    "pair_triangles",
    "price_deciles",
    "lsh_band_stats",
    "snm_pairs",
    "dup_inflation",
    "novelty_trend",
    "vocab_spectrum",
    "token_fertility",
    "source_overlap",
    "dup_lang_mismatch",
    "vocab_drift",
    "length_trend",
    "catalog_coverage",
    "blocking_comparison",
    "quality_trend",
    "encoding_advisor",
    "partition_advisor",
    "lang_top_tokens",
    "pr_curve",
    "partition_balance",
    "id_collisions",
    "group_freshness",
    "dispersion_profile",
    "pmi_collocations",
    "dedup_graph_stats",
    # zlib replayed via a content-hash-keyed VALUES oracle (covers the
    # hostile texts too — see __spark_entry__._compression_quality_oracle)
    "compression_quality",
    "container_probe",
    "srp_pairs_md5",
    "embedding_drift",
    "centroid_states",
    "span_templates",
    "template_drift",
    "embedding_dedup_attrition",
    "incremental_srp",
    "template_source_matrix",
]


def _vhash(cols, rows):
    # canonicalisation shared with scripts/hostile_probe.py by construction
    from evalidate_spark.fixtures import canon_lines

    h = hashlib.sha256()
    for ln in sorted(canon_lines(cols, rows)):
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def hostile_dir(spark, tmp_path_factory):
    from evalidate_spark.fixtures import write_hostile_tables

    return write_hostile_tables(spark, str(tmp_path_factory.mktemp("hostile")))


@pytest.mark.parametrize("name", QUERIES)
def test_hostile_corpus_oracle_parity(spark, hostile_dir, name):
    con = duckdb.connect()
    for t in (
        "documents", "events", "lineitem", "supplier", "embeddings",
        "part", "nation", "region", "orders",
    ):
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet/*.parquet'"
            % (t, hostile_dir, t)
        )
    sdf = entry.queries()[name](spark, hostile_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    ores = con.execute(entry.oracle_sql()[name]).fetchall()
    ocols = [d[0] for d in con.description]
    assert len(srows) == len(ores), (name, len(srows), len(ores))
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols)
    assert _vhash(scols, srows) == _vhash(ocols, ores), name


def test_gate_covers_every_oracled_query():
    """QUERIES is the whole oracled surface — adding an oracle without
    hostile coverage (or vice versa) fails here instead of rotting."""
    assert sorted(QUERIES) == sorted(entry.oracle_sql())


# ---- rows-only queries: no SQL oracle exists (xxhash64 / payload decode
# aren't SQL-expressible), so the hostile gate pins row counts and per-row
# invariants instead of hashes — every queries() entry asserts something
# non-vacuous on the adversarial corpus.


def test_hostile_minhash_pairs_invariants(spark, hostile_dir):
    rows = entry.queries()["minhash_pairs"](spark, hostile_dir).collect()
    # hostile docs 5 and 6 share identical non-trivial text → identical
    # signatures → LSH must surface at least that pair; NULL/empty/short
    # texts must never appear as candidates
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert len(pairs) == len(rows), "duplicate candidate pairs"
    assert all(a is not None and b is not None and a < b for a, b in pairs)
    assert ("5", "6") in pairs or (5, 6) in pairs
    bad_ids = {"1", "2", "3", 1, 2, 3}  # NULL/empty texts
    assert all(a not in bad_ids and b not in bad_ids for a, b in pairs)


def test_hostile_simhash_docs_invariants(spark, hostile_dir):
    rows = entry.queries()["simhash_docs"](spark, hostile_dir).collect()
    by_id = {r["doc_id"]: r["simhash"] for r in rows}
    # one signature row per document (NULL doc_id row included)
    assert len(rows) == 11
    # identical texts → identical signatures, and int64 range is respected
    assert by_id[5] == by_id[6]
    for v in by_id.values():
        assert v is not None and -(1 << 63) <= v < (1 << 63)
    # NULL and empty texts collapse to the deterministic empty-shingle
    # signature — stable, never a per-row garbage hash
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[1] != by_id[5]


def test_hostile_media_features_invariants(spark):
    rows = entry.queries()["media_features"](spark, "unused").collect()
    assert len(rows) == 200  # one feature row per synthetic payload
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["payload_sha"]) == 64
        if r["media_kind"] == "image":
            assert r["decoded"] and r["width"] > 0 and r["height"] > 0
            assert r["duration_ms"] is None and r["sample_rate"] is None
        elif r["media_kind"] == "audio":
            assert r["decoded"] and r["sample_rate"] == 4000
            assert r["duration_ms"] > 0 and r["rms"] > 0
        else:
            assert r["width"] > 0 and r["height"] > 0 and r["duration_ms"] > 0


def test_hostile_video_frames_invariants(spark):
    rows = entry.queries()["video_frames"](spark, "unused").collect()
    # 40 videos (ids 2,5,…,119), each sampled at 250 ms over
    # n_frames = 2 + (i//3) % 3 frames at 4 fps → n_frames grid points
    expected = sum(2 + k % 3 for k in range(40))
    assert len(rows) == expected
    for r in rows:
        i = int(r["media_ref"][2:])
        assert r["width"] == 8 + i % 8 and r["height"] == 8 + (i // 3) % 8
        assert r["ts_ms"] == 250 * r["sample_ix"]
        assert r["decoded"] and len(r["frame_sha"]) == 64
