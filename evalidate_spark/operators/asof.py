"""Point-in-time (as-of) join — the feature-correctness operator for
training-data pipelines.

``asof_join(left, right)`` attaches to each left row (an event, a training
example) the MOST RECENT right row (a feature snapshot, a dimension
version) with ``right.ts <= left.ts`` for the same key.  This is the
operation that prevents feature leakage: a naive equi-join on key lets a
label at time *t* see features computed after *t*; the as-of join is the
point-in-time-correct version.

The reference engine has no temporal operator (its whole surface is
row-local validation, ``/root/reference/src/evalidate.erl``); this module
is a north-rule pipeline addition, like :mod:`.sessions`.

Spark-first design — UNION + WINDOW, not a join
-----------------------------------------------
The textbook formulation (join on key + ``r.ts <= l.ts`` + keep max) is a
non-equi join: Catalyst can only run it as a broadcast-nested-loop or an
exploding equi-join-then-filter, both of which collapse at scale.  Instead
we exploit that "latest right row at or before t" is a running
``last_value`` over the time-ordered union of both sides:

1. tag left rows ``side=1`` and right rows ``side=0``;
2. union them on (key, ts, side, right-payload-or-null);
3. one window ``partitionBy(key).orderBy(ts, side)`` carries each right
   payload forward with ``last(col, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — right sorts before
   left at equal ts, so a snapshot effective exactly at the event's
   timestamp IS visible (ties = "at or before");
4. keep ``side=1`` rows.

Cost: exactly ONE shuffle (hash by key) + one sort — same as a sort-merge
join's left leg — with no row multiplication ever, regardless of how many
snapshots precede an event.  Parallelism is #keys; a hot key serialises
its own timeline only (mitigate upstream like sessionization's
``split_hours`` if one key owns the stream).

``tolerance`` bounds staleness: a match older than ``tolerance`` seconds
is nulled out (the carried effective-ts makes this a cheap post-filter,
no second window).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Optional[Sequence[str]] = None,
    tolerance_s: Optional[int] = None,
) -> DataFrame:
    """For each left row, attach the latest right ``value_cols`` with
    ``right[right_ts] <= left[left_ts]`` on key ``on`` (backward as-of
    join, ties inclusive).  Unmatched left rows keep NULL values — the
    left side is never filtered (LEFT ASOF semantics).

    Output = every left column, plus each value col, plus
    ``__asof_ts`` (the matched snapshot's timestamp, NULL if none).
    ``tolerance_s`` additionally nulls matches staler than the given
    seconds.  NULL keys or timestamps on the left pass through unmatched;
    NULL-keyed right rows can never match anything and are dropped.

    The two ts columns must be the SAME orderable type — TIMESTAMP,
    TIMESTAMP_NTZ, or a numeric epoch column (bigint micros is the
    timezone-proof choice).  For numeric ts, ``tolerance_s`` is
    interpreted in the COLUMN'S OWN UNIT, not seconds.
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError("value_cols collide with left columns: %s" % sorted(clash))

    k = F.col("`%s`" % on)
    lt = F.col("`%s`" % left_ts)
    rt = F.col("`%s`" % right_ts)

    rts_type = right.schema[right_ts].dataType
    l_tag = left.select(
        k.alias("__k"),
        lt.alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col("`%s`" % c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rts_type).alias("__rts"),
        *[F.lit(None).cast(right.schema["%s" % c].dataType).alias("__v_%s" % c)
          for c in value_cols],
    )
    r_tag = right.filter(k.isNotNull() & rt.isNotNull()).select(
        k.alias("__k"),
        rt.alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        rt.alias("__rts"),
        *[F.col("`%s`" % c).alias("__v_%s" % c) for c in value_cols],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__k",
        "__t",
        "__side",
        "__lrow",
        F.last("__rts", ignorenulls=True).over(w).alias("__asof_ts"),
        *[F.last("__v_%s" % c, ignorenulls=True).over(w).alias("__v_%s" % c)
          for c in value_cols],
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_s is not None:
        from pyspark.sql import types as T

        if isinstance(left.schema[left_ts].dataType, T.NumericType):
            bound = F.lit(int(tolerance_s))  # column's own unit
        else:
            bound = F.expr("INTERVAL '%d' SECOND" % int(tolerance_s))
        fresh = F.col("__asof_ts").isNotNull() & (
            F.col("__t") - F.col("__asof_ts") <= bound
        )
        out = out.select(
            "__k",
            "__lrow",
            F.when(fresh, F.col("__asof_ts")).alias("__asof_ts"),
            *[F.when(fresh, F.col("__v_%s" % c)).alias("__v_%s" % c)
              for c in value_cols],
        )
    return out.select(
        *[F.col("__lrow.`%s`" % c).alias(c) for c in left.columns],
        F.col("__asof_ts").alias("__asof_ts"),
        *[F.col("__v_%s" % c).alias(c) for c in value_cols],
    )
