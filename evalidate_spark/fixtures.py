"""Deterministic synthetic fixtures (FIXTURES.md schemas).

The interleaved text+media ``documents`` table (input_hint shape) and its
``media_catalog`` dimension are generated **distributed**: ``spark.range`` +
pure Column expressions seeded through ``xxhash64`` — no driver-side data, no
Python row loop, reproducible bit-for-bit at any parallelism, and linear in
cluster size (this is also the bench input generator, so it must scale the
same way the engine does).

Violation injection rates follow FIXTURES.md §1: ~1% null doc_id, ~0.5%
duplicate doc_id (with hot keys for skew), ~1% dangling media_ref, ~1%
kind/text/media_ref inconsistency, ~1% offset inversions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEED = 42


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols, F.lit(SEED))


def _pct(hash_col, pct_times_10: int) -> F.Column:
    """True for ~pct_times_10/1000 of rows, deterministically."""
    return F.pmod(hash_col, F.lit(1000)) < pct_times_10


def gen_documents(
    spark: SparkSession,
    n_docs: int,
    n_media: int = 10_000,
    max_spans: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Interleaved text+media documents:
    ``doc_id string, spans array<struct<kind,text,media_ref,offset int>>``."""
    base = spark.range(0, n_docs, numPartitions=partitions)
    i = F.col("id")
    h = _h(i)

    # doc_id: ~1% null, ~0.5% duplicates (mapped onto 3 hot keys for skew)
    doc_id = (
        F.when(_pct(_h(i, F.lit(1)), 10), F.lit(None))
        .when(
            _pct(_h(i, F.lit(2)), 5),
            F.concat(F.lit("hot-"), F.pmod(_h(i, F.lit(3)), F.lit(3)).cast("string")),
        )
        .otherwise(F.concat(F.lit("doc-"), i.cast("string")))
    )

    n_spans = (F.pmod(h, F.lit(max_spans)) + 1).cast("int")

    def span(j: F.Column) -> F.Column:
        hj = _h(i, j)
        is_text = F.pmod(hj, F.lit(2)) == 0
        # ~1% kind/text/media_ref inconsistency: text span carrying media_ref
        inconsistent = _pct(_h(i, j, F.lit(4)), 10)
        # ~1% dangling refs: index beyond the catalog
        ref_ix = F.when(
            _pct(_h(i, j, F.lit(5)), 10),
            F.pmod(_h(i, j, F.lit(6)), F.lit(n_media)) + n_media,
        ).otherwise(F.pmod(_h(i, j, F.lit(6)), F.lit(n_media)))
        media_ref = F.concat(F.lit("m-"), ref_ix.cast("string"))
        text = F.concat(
            F.lit("token"),
            F.pmod(hj, F.lit(997)).cast("string"),
            F.lit(" word"),
            F.pmod(_h(i, j, F.lit(7)), F.lit(503)).cast("string"),
        )
        # offsets grow ~j*7; ~1% inverted (negative step)
        offset = F.when(
            _pct(_h(i, j, F.lit(8)), 10), (j * 7 - 11).cast("int")
        ).otherwise((j * 7).cast("int"))
        return F.struct(
            F.when(is_text, F.lit("text")).otherwise(F.lit("media")).alias("kind"),
            F.when(is_text | inconsistent, text).alias("text"),
            F.when(~is_text | inconsistent, media_ref).alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return base.select(doc_id.alias("doc_id"), spans.alias("spans"))


def gen_media_catalog(spark: SparkSession, n_media: int = 10_000) -> DataFrame:
    """media_catalog(media_ref PK, media_kind, size_bytes) — FIXTURES.md §2."""
    i = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(_h(i), F.lit(3)) + 1).cast("int"),
    )
    return spark.range(0, n_media).select(
        F.concat(F.lit("m-"), i.cast("string")).alias("media_ref"),
        kind.alias("media_kind"),
        (F.pmod(_h(i, F.lit(9)), F.lit(10_000_000)) + 100).alias("size_bytes"),
    )


def gen_events_baseline(spark: SparkSession, n: int = 10_000) -> DataFrame:
    """Synthetic numeric distribution for drift tests (stable baseline)."""
    i = F.col("id")
    return spark.range(0, n).select(
        (F.pmod(_h(i), F.lit(1000)) / 100.0).alias("value")
    )


def gen_events_shifted(spark: SparkSession, n: int = 10_000, shift: float = 3.0) -> DataFrame:
    i = F.col("id")
    return spark.range(0, n).select(
        (F.pmod(_h(i), F.lit(1000)) / 100.0 + shift).alias("value")
    )
