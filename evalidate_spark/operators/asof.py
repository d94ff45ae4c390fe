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

from pyspark.sql import DataFrame, Window, functions as F, types as T


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


def _to_us(df: DataFrame, col: str):
    """Epoch-micros view of a timestamp/NTZ column, the column itself if
    numeric (same unit convention as ``asof_join``'s tolerance)."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.NumericType):
        return F.col("`%s`" % col).cast("bigint")
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `%s`)"
            % col
        )
    return F.unix_micros(F.col("`%s`" % col))


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: Optional[Sequence[str]] = None,
    value_cols: Optional[Sequence[str]] = None,
    bucket: Optional[int] = None,
) -> DataFrame:
    """Point-in-interval join: each left row paired with every right row
    whose ``[right_start, right_end]`` (INCLUSIVE both ends) contains
    ``left[left_point]``, optionally also matching equi-keys *on*
    (``on`` maps name-to-name; rename upstream if the sides differ).

    Returns an INNER join — left rows with no containing interval drop
    (wrap with your own left-anti if absence is the finding).  NULL
    points, NULL interval bounds, and inverted intervals
    (``start > end``) never match.  Output: every left column + the
    right *value_cols* (default: right columns minus the bounds/keys),
    with a clash check like :func:`asof_join`.

    Scale: the naive formulation is a non-equi join — without equi keys
    Catalyst can only run it as a broadcast-nested-loop (a cartesian at
    100 TB).  *bucket* activates the BUCKETED plan: left hashes on
    ``floor(point / bucket)``, each right interval explodes to the
    buckets it overlaps, and the join becomes a plain equi-join on
    (keys…, bucket) with the range check as a residual filter — a point
    lives in exactly ONE bucket, so no post-dedup is ever needed.  Cost:
    each right row is replicated ``span/bucket + 1`` times — pick a
    bucket near the TYPICAL interval span (the replication is then ~2×)
    and never orders of magnitude below it.  With equi keys and no
    *bucket*, the plain sort-merge equi-join + residual filter is
    already the right plan and is used as-is.

    *bucket* is in the point column's own unit for numeric columns and
    in SECONDS for timestamp columns (converted to micros internally) —
    the ``asof_join`` tolerance convention.
    """
    on = list(on or [])
    if not on and bucket is None:
        raise ValueError(
            "range_join without equi keys needs bucket=<width>: the "
            "non-equi plan is a cartesian at scale"
        )
    if value_cols is None:
        value_cols = [
            c
            for c in right.columns
            if c not in (right_start, right_end) and c not in on
        ]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError("value_cols collide with left columns: %s" % sorted(clash))

    pt = _to_us(left, left_point)
    st = _to_us(right, right_start)
    en = _to_us(right, right_end)
    ts_like = not isinstance(left.schema[left_point].dataType, T.NumericType)

    l = left.select(
        F.struct(*[F.col("`%s`" % c) for c in left.columns]).alias("__lrow"),
        pt.alias("__pt"),
        *[F.col("`%s`" % k).alias("__lk_%s" % k) for k in on],
    ).filter(F.col("__pt").isNotNull())
    r = right.select(
        st.alias("__st"),
        en.alias("__en"),
        *[F.col("`%s`" % k).alias("__rk_%s" % k) for k in on],
        *[F.col("`%s`" % c).alias("__v_%s" % c) for c in value_cols],
    ).filter(
        F.col("__st").isNotNull()
        & F.col("__en").isNotNull()
        & (F.col("__st") <= F.col("__en"))
    )

    eq = [F.col("__lk_%s" % k) == F.col("__rk_%s" % k) for k in on]
    if bucket is not None:
        if bucket <= 0:
            raise ValueError("bucket must be positive")
        w = int(bucket) * (1_000_000 if ts_like else 1)
        fdiv = lambda c: F.expr(  # noqa: E731 — floor-div, negative-safe
            "(%s - pmod(%s, %d)) div %d" % (c, c, w, w)
        )
        l = l.withColumn("__b", fdiv("__pt"))
        r = r.withColumn(
            "__bs", F.sequence(fdiv("__st"), fdiv("__en"))
        ).withColumn("__b", F.explode("__bs")).drop("__bs")
        eq.append(l["__b"] == r["__b"])
        cond = eq[0]
        for c in eq[1:]:
            cond = cond & c
        j = l.join(r, cond, "inner")
    else:
        cond = eq[0]
        for c in eq[1:]:
            cond = cond & c
        j = l.join(r, cond, "inner")

    out = j.filter(
        (F.col("__pt") >= F.col("__st")) & (F.col("__pt") <= F.col("__en"))
    )
    return out.select(
        *[F.col("__lrow.`%s`" % c).alias(c) for c in left.columns],
        *[F.col("__v_%s" % c).alias(c) for c in value_cols],
    )


def interval_islands(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    tolerance: int = 0,
) -> DataFrame:
    """Gaps-and-islands: merge overlapping (or within-*tolerance*
    adjacent) CLOSED intervals per key into maximal islands — the
    interval-algebra complement of :func:`range_join` (that asks "which
    point hits which interval?", this asks "what contiguous coverage do
    the intervals add up to?").  The canonical uses: stitching
    validity/session/maintenance windows, coverage gaps in a feed,
    span-coalescing before a range join shrinks its build side.

    An interval starts a new island iff its start exceeds the running
    maximum end of every EARLIER interval (ordered by ``(start, end)``)
    by more than *tolerance* — the classic cumulative-max formulation,
    which is order-correct even when a long interval swallows later
    short ones.  Output: ``(key..., island_ix, island_start,
    island_end, n_intervals)`` with ``island_ix`` 1-based per key.
    Rows with a NULL start or end are dropped (no place on the line);
    NULL keys group like SQL.  *start*/*end* must be integral (epoch µs
    convention); intervals with ``end < start`` are rejected upstream by
    the caller's contract — they would silently extend nothing.

    Plan: ONE hash shuffle on the key; the running max and the island
    counter are frames over the SAME sort, and the final roll-up groups
    by (key, island) — a superset of the window key, so no second
    exchange.  A hot key costs its interval share of one sort; nothing
    is collected.
    """
    if not key_cols:
        raise ValueError("interval_islands needs key_cols")
    if tolerance < 0:
        raise ValueError("tolerance must be >= 0")
    keys = [F.col("`%s`" % k) for k in key_cols]
    s = F.col("`%s`" % start_col)
    e = F.col("`%s`" % end_col)
    live = df.filter(s.isNotNull() & e.isNotNull()).select(
        *[k.alias("__k%d" % i) for i, k in enumerate(keys)],
        s.cast("long").alias("__s"),
        e.cast("long").alias("__e"),
    )
    kcols = ["__k%d" % i for i in range(len(keys))]
    w = Window.partitionBy(*kcols).orderBy(F.col("__s").asc(), F.col("__e").asc())
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull()
        | (F.col("__s") > prev_max_end + F.lit(int(tolerance))),
        1,
    ).otherwise(0)
    marked = live.withColumn("__new", new_island).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        marked.groupBy(*kcols, "__island")
        .agg(
            F.min("__s").alias("island_start"),
            F.max("__e").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .select(
            *[F.col(kc).alias(k) for kc, k in zip(kcols, key_cols)],
            F.col("__island").cast("long").alias("island_ix"),
            "island_start",
            "island_end",
            "n_intervals",
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_id: str,
    right_id: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_s: int = 86400,
) -> DataFrame:
    """Interval × interval overlap join — the third member of the
    interval-algebra family (:func:`range_join` answers "which point
    hits which interval", :func:`interval_islands` "what coverage do
    intervals sum to"; this answers "which intervals from A and B
    coexist"): per key, every pair of CLOSED intervals that share at
    least one instant.  Canonical uses: sessions × campaign windows,
    outage windows × SLA windows, validity-interval reconciliation
    between two SCD2 tables.

    Output: ``(on, left_id, right_id, overlap_start, overlap_end,
    overlap_us)`` with ``overlap_start = max(starts)``, ``overlap_end =
    min(ends)`` and ``overlap_us = end - start`` (0 = single shared
    instant — closed-interval touch counts).  Start/end must be integral
    epoch µs; rows with NULL key/id/bounds or ``end < start`` (malformed)
    are dropped.

    Scale shape: the naive form is a per-key cross join — quadratic in
    the hot key.  Here each interval is exploded to the *bucket_s* grid
    cells it covers (cost = interval length / bucket, the caller's dial),
    pairs meet in an equi-join on (key, cell) — co-located, never
    crossed — then ``distinct`` collapses multi-cell meetings and the
    EXACT overlap predicate re-verifies (cell co-residence is a superset
    of overlap).  One shuffle per side on (key, cell), one distinct at
    candidate cardinality; the candidate count is output + near-miss
    pairs sharing a cell, bounded by grid density rather than key³.
    """
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    b_us = int(bucket_s) * 1_000_000

    def prep(df, idc, sc, ec, side):
        k = F.col("`%s`" % on)
        i = F.col("`%s`" % idc)
        s = F.col("`%s`" % sc).cast("long")
        e = F.col("`%s`" % ec).cast("long")
        return (
            df.filter(
                k.isNotNull() & i.isNotNull() & s.isNotNull()
                & e.isNotNull() & (e >= s)
            )
            .select(
                k.alias("__k"),
                i.alias("__%s_id" % side),
                s.alias("__%s_s" % side),
                e.alias("__%s_e" % side),
            )
            .withColumn(
                "__cell",
                F.explode(
                    F.sequence(
                        F.expr(
                            "(__%s_s - pmod(__%s_s, %d)) div %d"
                            % (side, side, b_us, b_us)
                        ),
                        F.expr(
                            "(__%s_e - pmod(__%s_e, %d)) div %d"
                            % (side, side, b_us, b_us)
                        ),
                    )
                ),
            )
        )

    lt = prep(left, left_id, left_start, left_end, "l")
    rt = prep(right, right_id, right_start, right_end, "r")
    cand = (
        lt.join(rt, ["__k", "__cell"])
        .filter(
            (F.col("__l_s") <= F.col("__r_e"))
            & (F.col("__r_s") <= F.col("__l_e"))
        )
        .select("__k", "__l_id", "__r_id", "__l_s", "__l_e", "__r_s", "__r_e")
        .distinct()
    )
    ov_s = F.greatest("__l_s", "__r_s")
    ov_e = F.least("__l_e", "__r_e")
    return cand.select(
        F.col("__k").alias(on),
        F.col("__l_id").alias(left_id),
        F.col("__r_id").alias(right_id),
        ov_s.alias("overlap_start"),
        ov_e.alias("overlap_end"),
        (ov_e - ov_s).cast("long").alias("overlap_us"),
    )
