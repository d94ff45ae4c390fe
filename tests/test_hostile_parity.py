"""Adversarial oracle-parity gate: 44 driver queries — the whole oracled
surface over documents/events/lineitem/supplier — must hash-match their
DuckDB oracles on HOSTILE tables: NULL texts/ids/timestamps/users/keys/
measures, empty and multi-space texts, duplicate texts, invalid enum and
regex values.

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
    "exact_dup_groups",
    "contamination",
    "pii_redaction",
    "quality_topk",
    "quality_documents",
    "chunked_docs",
    "fingerprint_documents",
    "token_counts",
    "sampled_docs",
    "stratified_sample",
    "packed_sequences",
    "minhash_pairs_md5",
    "top_ngrams",
    "lang_marker_counts",
    "token_counts_bpe",
    "jaccard_pairs",
    "zorder_events",
    "sessions",
    "asof_features",
    "histogram_events_value",
    "uniqueness_events_user",
    "drift_events",
    "drift_event_types",
    "uniqueness_composite",
    "iqr_outliers",
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
    # lineitem/supplier surface (NULL keys, measures, dates)
    "profile_lineitem",
    "profile_quantiles",
    "drift_quantile",
    "referential_lineitem_supplier",
    "referential_bloom",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "%.6g" % v
    return str(v)


def _vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def hostile_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("hostile"))
    rows = [
        (1, None, "en", "src1", 0),
        (2, None, "en", "src2", 0),
        (3, "", "es", "src3", 0),
        (4, "a  b   c", "en", "src4", 8),
        (5, "x y z x y z", "es", "src5", 11),
        (6, "x y z x y z", "zz", "bad!", 11),   # bad lang + regex-fail src
        (7, "the the the the", None, "src7", None),  # NULL lang + n_chars
        (None, "orphan text row here", "de", "src8", 20),
        (8, "solo", "de", None, 4),             # NULL source
    ]
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "documents.parquet"))
    )
    ev = [
        (1, "2026-01-01 10:00:00", 1, "view", 1.5, None),
        (2, "2026-01-01 10:05:00", 1, "view", None, None),  # NULL value
        (3, "2026-01-01 11:00:00", 1, "buy", 2.5, None),
        (4, "2026-01-01 10:00:00", None, "view", 3.0, None),  # NULL user
        (5, None, 2, "view", 4.0, None),  # NULL ts
        (6, "2026-01-01 10:30:00", 2, None, 0.0, None),  # NULL type
        (None, "2026-01-01 12:00:00", 3, "view", -1.0, None),  # NULL id
    ]
    (
        spark.createDataFrame(
            ev,
            "event_id long, ts_s string, user_id long, event_type string, "
            "value double, props string",
        )
        .selectExpr(
            "event_id", "cast(ts_s as timestamp) ts", "user_id", "event_type",
            "value", "props",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "events.parquet"))
    )
    li = [
        (1, 1, 2, 10.0, "N", "2026-01-05"),
        (1, 2, 4, 20.0, "R", "2026-01-06"),
        (2, 1, 3, None, "A", None),
        (2, 2, None, 30.0, None, "2026-01-07"),
        (None, 1, 6, 40.0, "N", "2026-01-08"),
        (3, None, 99, 50.0, "R", "2026-01-09"),
    ]
    (
        spark.createDataFrame(
            li,
            "l_orderkey long, l_linenumber int, l_suppkey long, "
            "l_quantity double, l_returnflag string, l_shipdate_s string",
        )
        .selectExpr(
            "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity",
            "l_returnflag", "cast(l_shipdate_s as date) l_shipdate",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "lineitem.parquet"))
    )
    (
        spark.createDataFrame(
            [(2, "s2"), (4, "s4"), (6, "s6"), (None, "snull")],
            "s_suppkey long, s_name string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "supplier.parquet"))
    )
    return tmp


@pytest.mark.parametrize("name", QUERIES)
def test_hostile_corpus_oracle_parity(spark, hostile_dir, name):
    con = duckdb.connect()
    for t in ("documents", "events", "lineitem", "supplier"):
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
