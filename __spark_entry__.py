"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship validation query at sf0.001.
``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (engine rule validation, presence/defaults, converters/clean
output, stats profile, uniqueness, referential anti-join, span-structure
HOF checks, histogram/drift input, plus training-data ops); ``oracle_sql()``
gives the DuckDB-equivalent SQL the driver cross-checks at sf0.01.

Column names are aliased identically on both sides (the driver sorts
columns by name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evalidate_spark import Allowed, Default, Regexp, Rule, Size, Type, validate
from evalidate_spark.operators.table_checks import (
    histogram_df,
    profile,
    referential_violations,
    uniqueness_violations,
)
from evalidate_spark.operators.spans import media_refs, span_structure_violations

DEFAULT_SF = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- flagship
# Full rule-set pass over the documents table: presence + type + size +
# allowed-set + regexp validators (SURVEY §2.3/§2.4), compiled to ONE fused
# projection (no shuffle; violations exploded sparsely afterwards).

ALLOWED_LANGS = ["en", "es", "de", "fr"]
SOURCE_RE = "^src[0-9]$"


def _doc_rules() -> list:
    return [
        Rule(key="doc_id", presence="required", validators=[Type("integer")]),
        Rule(key="text", presence="required", validators=[Type("binary"), Size(50, 500)]),
        Rule(key="lang", presence="required", validators=[Allowed(ALLOWED_LANGS)]),
        Rule(key="source", presence="required", validators=[Regexp(SOURCE_RE)]),
        Rule(key="n_chars", presence="required", validators=[Size(60, 400)]),
    ]


def q_validate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    res = validate(docs, _doc_rules(), id_cols=["doc_id"])
    return res.violations.select("doc_id", "rule_seq", "rule_id", "key_path", "message")


def q_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converted clean output: only ruled keys survive, converters applied
    (reference key-dropping semantics, evalidate_SUITE.erl:1703-1716)."""
    docs = _t(spark, sf_dir, "documents")
    rules = [
        Rule(key="doc_id", presence="required", converter="to_binary"),
        Rule(key="text", presence="required", validators=[Size(50, 500)]),
        Rule(key="lang", presence="required", validators=[Allowed(ALLOWED_LANGS)]),
        Rule(key="source", presence="required", validators=[Regexp(SOURCE_RE)],
             converter="lowercase"),
        Rule(key="n_chars", presence="required", validators=[Size(60, 400)]),
    ]
    return validate(docs, rules, id_cols=["doc_id"]).clean


def q_optional_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """presence={optional, Default}: default injected for missing values,
    validators skipped for defaulted rows (evalidate.erl:117)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.lit(None)).otherwise(F.col("lang")).alias("maybe_lang"),
    )
    rules = [
        Rule(key="doc_id", presence="required"),
        Rule(key="maybe_lang", presence=Default("unknown")),
    ]
    return validate(docs, rules, id_cols=["doc_id"]).clean


# ------------------------------------------------------------ table checks
def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = profile(
        li,
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        approx_distinct=False,
        quantiles=(),
    )
    return p.select("column", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")


def q_uniqueness_events_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return uniqueness_violations(ev, "user_id")


def q_referential_lineitem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dim = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 2 == 0)
    bad = referential_violations(li, "l_suppkey", dim, "s_suppkey", broadcast_dim=True)
    return bad.select("l_orderkey", "l_linenumber", "l_suppkey")


def q_histogram_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return histogram_df(ev, "value", bins=10)


# ------------------------------------------------------- span HOF checks
def _derived_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic interleaved text+media spans derived from the flat
    documents table (input_hint shape) — same construction is expressed in
    the DuckDB oracles, so violations are exactly predictable."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    span0 = F.struct(
        F.when(i % 17 == 0, F.lit("meta")).otherwise(F.lit("text")).alias("kind"),
        F.col("text").alias("text"),
        F.when(i % 13 == 0, F.concat(F.lit("m-"), (i % 50).cast("string"))).alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    span1 = F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("m-"), (i % 30).cast("string")).alias("media_ref"),
        F.col("n_chars").cast("int").alias("offset"),
    )
    span2 = F.struct(
        F.lit("text").alias("kind"),
        F.substring(F.col("text"), 1, 10).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.when(i % 11 == 0, F.col("n_chars") - 5)
        .otherwise(F.col("n_chars") + 5)
        .cast("int")
        .alias("offset"),
    )
    return d.select(i.alias("doc_id"), F.array(span0, span1, span2).alias("spans"))


def q_span_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_structure_violations(_derived_spans(spark, sf_dir))


def q_span_refs_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _derived_spans(spark, sf_dir)
    refs = media_refs(docs)
    catalog = spark.range(20).select(
        F.concat(F.lit("m-"), F.col("id").cast("string")).alias("media_ref")
    )
    bad = referential_violations(refs, "media_ref", catalog, "media_ref", broadcast_dim=True)
    return bad.select("doc_id", "media_ref")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rule-set validation pass over sf0.001 documents."""
    return q_validate_documents(spark, DEFAULT_SF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "validate_documents": q_validate_documents,
        "clean_documents": q_clean_documents,
        "optional_default": q_optional_default,
        "profile_lineitem": q_profile_lineitem,
        "uniqueness_events_user": q_uniqueness_events_user,
        "referential_lineitem_supplier": q_referential_lineitem_supplier,
        "histogram_events_value": q_histogram_events_value,
        "span_structure": q_span_structure,
        "span_refs_dangling": q_span_refs_dangling,
    }


_ALLOWED_REPR = '[<<"en">>,<<"es">>,<<"de">>,<<"fr">>]'

ORACLE = {
    "validate_documents": f"""
WITH v AS (
  SELECT doc_id, 2 AS rule_seq, 'rule:text' AS rule_id, 'text' AS key_path,
         CASE WHEN length(text) < 50
              THEN 'Value is not valid. Value''s byte_size is less than minimum allowed: 50'
              ELSE 'Value is not valid. Value''s byte_size is more than maximum allowed: 500' END AS message
  FROM documents WHERE length(text) < 50 OR length(text) > 500
  UNION ALL
  SELECT doc_id, 3, 'rule:lang', 'lang',
         'Value ''\\<\\<"' || lang || '"\\>\\>'' is not valid. Value is not in allowed list {_ALLOWED_REPR}'
  FROM documents WHERE lang NOT IN ('en','es','de','fr')
  UNION ALL
  SELECT doc_id, 4, 'rule:source', 'source',
         'Value ''' || source || ''' is not valid. Validation with regexp ''^src[0-9]$'' failed'
  FROM documents WHERE NOT regexp_matches(source, '^src[0-9]$')
  UNION ALL
  SELECT doc_id, 5, 'rule:n_chars', 'n_chars',
         CASE WHEN n_chars < 60
              THEN 'Value is not valid. Value''s limit is less than minimum allowed: 60'
              ELSE 'Value is not valid. Value''s limit is more than maximum allowed: 400' END
  FROM documents WHERE n_chars < 60 OR n_chars > 400
)
SELECT * FROM v
""",
    "clean_documents": """
SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, lang, lower(source) AS source, n_chars
FROM documents
WHERE length(text) BETWEEN 50 AND 500
  AND lang IN ('en','es','de','fr')
  AND regexp_matches(source, '^src[0-9]$')
  AND n_chars BETWEEN 60 AND 400
""",
    "optional_default": """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 0 THEN 'unknown' ELSE lang END AS maybe_lang
FROM documents
""",
    "profile_lineitem": """
SELECT 'l_orderkey' AS column, count(*) AS n_rows,
       count(*) - count(l_orderkey) AS n_nulls,
       count(DISTINCT l_orderkey) AS n_distinct,
       CAST(min(l_orderkey) AS VARCHAR) AS min_repr,
       CAST(max(l_orderkey) AS VARCHAR) AS max_repr
FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
       count(DISTINCT l_returnflag),
       CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
       count(DISTINCT l_shipdate),
       CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
FROM lineitem
""",
    "uniqueness_events_user": """
SELECT user_id, count(*) AS dup_count
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id HAVING count(*) > 1
""",
    "referential_lineitem_supplier": """
SELECT l_orderkey, l_linenumber, l_suppkey
FROM lineitem
WHERE l_suppkey IS NOT NULL
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 2 = 0)
""",
    "histogram_events_value": """
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events WHERE value IS NOT NULL)
SELECT LEAST(9, GREATEST(0, CAST(FLOOR((value - b.lo) / ((b.hi - b.lo) / 10)) AS INT))) AS bucket,
       count(*) AS n
FROM events, b WHERE value IS NOT NULL
GROUP BY 1
""",
    "span_structure": """
SELECT doc_id, 'span:kind_allowed' AS rule_id, 0 AS span_index,
       'span kind is not one of text|media' AS message
FROM documents WHERE doc_id % 17 = 0
UNION ALL
SELECT doc_id, 'span:kind_consistency', 0,
       'text/media_ref fields are inconsistent with span kind'
FROM documents WHERE doc_id % 13 = 0 OR doc_id % 17 = 0
UNION ALL
SELECT doc_id, 'span:offset_monotonic', 1, 'span offset decreases'
FROM documents WHERE doc_id % 11 = 0
""",
    "span_refs_dangling": """
SELECT doc_id, 'm-' || CAST(doc_id % 50 AS VARCHAR) AS media_ref
FROM documents WHERE doc_id % 13 = 0 AND doc_id % 50 >= 20
UNION ALL
SELECT doc_id, 'm-' || CAST(doc_id % 30 AS VARCHAR)
FROM documents WHERE doc_id % 30 >= 20
""",
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
