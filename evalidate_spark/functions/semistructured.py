"""Semi-structured COLUMN extraction — typed projection out of a JSON
string column (the ``events.props`` shape: every row carries a bag of
ad-hoc properties the pipeline wants as real typed columns).

Distinct from :mod:`..sources`' malformed-capture reader: that parses
whole INGESTED LINES; this parses one column of an already-structured
row, so the error unit is the cell — the row survives with a parse flag
instead of moving to a violation channel.

Scale: pure ``from_json`` Column expressions — JVM-side Jackson parse,
no UDF, no shuffle; the projection prunes to exactly the requested
fields (Spark pushes the needed-field set into the parser via
schema-of-interest, so "extract one key of fifty" does not build the
other forty-nine).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def json_extract_typed(
    df: DataFrame,
    json_col: str,
    schema: Union[str, T.StructType],
    keep: Sequence[str] = (),
) -> DataFrame:
    """Project typed fields out of a JSON string column: one output row
    per input row — ``keep`` columns passed through, one column per
    *schema* field, plus ``json_ok``:

    * ``true``  — the cell parsed as JSON (fields that failed their
      individual type coercion are NULL, PERMISSIVE semantics: a bad
      field does not poison its siblings);
    * ``false`` — the cell is non-NULL but not parseable JSON (every
      extracted field NULL);
    * ``NULL``  — the cell itself is NULL (nothing was parsed, which is
      a different fact than "parsed and failed" — count them apart).

    *schema* is a DDL string (``"k bigint, tag string"``) or a
    StructType.  Extracted field names must not collide with *keep*.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    fields = [f.name for f in schema.fields]
    clash = set(fields) & set(keep)
    if clash:
        raise ValueError("schema fields collide with keep: %s" % sorted(clash))
    src = F.col("`%s`" % json_col)
    parsed = F.from_json(src, schema)
    # from_json PERMISSIVE never nulls the struct, so cell validity comes
    # from try_parse_json (NULL on non-JSON) — matching SQL json_valid
    return df.select(
        *[F.col("`%s`" % c) for c in keep],
        *[parsed.getField(f).alias(f) for f in fields],
        F.when(src.isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.try_parse_json(src).isNotNull())
        .alias("json_ok"),
    )


def json_key_profile(df: DataFrame, col: str) -> DataFrame:
    """Schema discovery over a semi-structured JSON column — which keys
    actually occur, how often: ``(key, n_rows, share_bp)`` with exact
    integer-basis-point share of ALL rows.  The pre-flight for
    :func:`json_extract_typed`: you cannot write the typed projection
    (or a presence rule) for a property bag you haven't profiled, and at
    10^12 docs "what keys are in props?" is not answerable by eyeball.

    Two reserved pseudo-keys keep the report single-grain and complete:
    ``__null__`` (the cell was NULL) and ``__malformed__`` (non-NULL but
    no object keys extractable — broken JSON or a non-object root like
    ``[1,2]``/``"str"``; Spark's ``json_object_keys`` returns NULL for
    both).  A parsed EMPTY object ``{}`` has no keys and contributes no
    row, so ``Σ n_rows`` can undershoot the row count — by exactly the
    empty-object count.

    Scale shape: one projection + an explode that multiplies each row by
    its OWN key count only (property bags are narrow), a
    map-side-combined groupBy over key cardinality, and the 1-row total
    joined back by broadcast.  No UDF, no driver collect."""
    c = F.col("`%s`" % col)
    keys = F.json_object_keys(c)
    tagged = df.select(
        F.explode(
            F.when(c.isNull(), F.array(F.lit("__null__")))
            .when(keys.isNull(), F.array(F.lit("__malformed__")))
            .otherwise(keys)
        ).alias("key")
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return (
        tagged.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .join(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.expr("(n_rows * 10000) DIV total").cast("long").alias(
                "share_bp"
            ),
        )
    )
