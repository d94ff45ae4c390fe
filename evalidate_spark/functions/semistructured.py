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
