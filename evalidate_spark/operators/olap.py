"""Dimensional OLAP faces of the corpus tables — hierarchy roll-ups
(GROUP BY ROLLUP with an explicit grouping id) and pinned-value pivot
matrices.

Not in the reference (row-local validation only); added as north-rule
analytics surface: every "counts by lang, by source, and overall, in one
pass" dashboard is a rollup, and every cross-tab ("sources × languages")
is a pivot.  Both compile to a SINGLE Spark aggregate — rollup expands
grouping sets inside one Expand + one exchange; pivot with PINNED values
is one groupBy with conditional aggregates (never the two-pass distinct
scan that un-pinned pivot needs, and the output schema is static, which
is what a downstream contract wants anyway).

Scale notes: rollup's Expand multiplies rows by (#levels) BEFORE the
exchange, but partial aggregation collapses each level map-side, so the
shuffle carries ~(level cardinality) rows; pivot shuffles the row-key
groups only.  NULL DIMENSION VALUES are real groups (SQL semantics) —
the rollup's own NULL placeholders are disambiguated by ``grouping_id``
(0 = leaf row, bit set = that dim rolled up, first dim = MSB).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def rollup_report(
    df: DataFrame,
    dims: Sequence[str],
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Hierarchy roll-up over *dims* (left-to-right, SQL ROLLUP): one
    row per group at every prefix level plus the grand total —
    ``(dims…, grouping_id, n_rows[, total_weight])``.  ``grouping_id``
    is the standard bitmask (first dim = most significant bit; 0 = leaf
    group, all-bits = grand total), which is also how a consumer tells
    a rolled-up NULL from a genuine NULL dimension value.
    ``total_weight`` (present when *weight_col* is given) is the
    NULL-skipping sum cast to long (integral-weight contract)."""
    if not dims:
        raise ValueError("rollup_report needs dims")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    if weight_col is not None:
        aggs.append(
            F.sum(F.col("`%s`" % weight_col)).cast("long").alias("total_weight")
        )
    return (
        df.rollup(*[F.col("`%s`" % d) for d in dims])
        .agg(F.grouping_id().cast("long").alias("grouping_id"), *aggs)
        .select(
            *dims,
            "grouping_id",
            "n_rows",
            *(["total_weight"] if weight_col is not None else []),
        )
    )


def pivot_matrix(
    df: DataFrame,
    row_col: str,
    col_col: str,
    values: Sequence[str],
) -> DataFrame:
    """Cross-tab count matrix with a PINNED column domain: one row per
    *row_col* group, one count column per entry of *values* (missing
    combinations are NULL, matching SQL's empty conditional sum — a
    downstream "fill 0" is one ``fillna``).  Pinning does two things at
    scale: the plan is ONE groupBy with |values| conditional aggregates
    (un-pinned pivot first runs a distinct scan over the column), and
    the output schema is static — a moving schema is a broken contract
    for anything reading the matrix.  Rows whose *col_col* value is
    outside *values* (including NULL) count toward no column but keep
    their row present if they are its only rows."""
    if not values:
        raise ValueError("pivot_matrix needs pinned values")
    if len(set(values)) != len(values):
        raise ValueError("pivot values must be unique")
    return df.groupBy(F.col("`%s`" % row_col)).agg(
        *[
            F.sum(
                F.when(F.col("`%s`" % col_col) == F.lit(v), 1)
            )
            .cast("long")
            .alias(v)
            for v in values
        ]
    )
