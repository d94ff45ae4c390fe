"""Behavioral event analytics — ordered funnels and cohort retention.

Two classic event-stream questions a pipeline health dashboard asks of
the same ``events`` table the validation engine already gates:

- :func:`funnel_steps` — ORDERED conversion: of the entities that did
  step 1, how many later did step 2, then step 3, …  "Later" is strict
  sequence (a purchase BEFORE the signup doesn't count toward the
  signup→purchase funnel), which is what separates a funnel from a mere
  per-type count.
- :func:`cohort_retention` — group entities by first-activity period
  (the cohort) and count how many are active again k periods later.
  The drop curve is the canonical engagement / data-freshness view.

The reference engine is row-local (``/root/reference/src/evalidate.erl``);
these are north-rule pipeline additions like :mod:`.sessions`.

Scale notes
-----------
``funnel_steps`` is k chained aggregate+join rounds on the SAME entity
key (k = number of steps, a small constant): each round is one
map-side-combined min-aggregate over only the rows of that step's type
plus one equi-join to the (one-row-per-entity) frontier of the previous
step — never a window over the full event stream, never a per-entity
collect of event arrays (a hot entity with 10^8 events costs nothing
more than its share of the min-aggregates).  ``cohort_retention`` is
one min-aggregate for first-seen + one join back + one tiny groupBy on
(cohort, offset) — two shuffles at entity/bucket cardinality.  All time
math is integer epoch arithmetic (no calendar, no timezone).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F, types as T

from .sessions import _micros as _session_micros

_US = 1_000_000


def _micros(df: DataFrame, ts_col: str):
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.NumericType):
        return F.col("`%s`" % ts_col).cast("bigint")
    return _session_micros(df, ts_col)


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel over *steps* (event-type names, in order).

    An entity reaches step i when it has an event of type ``steps[i]``
    at-or-after its EARLIEST qualifying time for step i−1 (ties
    inclusive: same-timestamp step pairs count, since event order within
    a timestamp is unknowable).  Output: one row per step —
    ``(step_ix, step, n_entities, conv_from_prev_bp, conv_from_first_bp)``
    with conversions as integer basis points (``10000·n_i // n_{i-1}``,
    NULL for step 1 and whenever the denominator is 0).

    Entities with a NULL key or NULL timestamp never participate (a
    funnel needs an identity and a time).  Steps may repeat
    (view→click→view counts re-views after the click).

    Plan: one filtered min-aggregate + frontier equi-join per step, all
    hashing on the SAME key so AQE/exchange-reuse keeps co-partitioning;
    the per-step counts are 1-row aggregates unioned at the end.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel_steps needs at least two steps")
    k = F.col("`%s`" % key_col)
    t = F.col("`%s`" % type_col)
    base = events.filter(
        k.isNotNull() & F.col("`%s`" % ts_col).isNotNull()
    ).select(
        k.alias("__k"), t.alias("__t"), _micros(events, ts_col).alias("__us")
    )

    # frontier_i: (entity, earliest time entity completed steps[0..i])
    frontier = (
        base.filter(F.col("__t") == steps[0])
        .groupBy("__k")
        .agg(F.min("__us").alias("__at"))
    )
    counts = [frontier.select(F.count(F.lit(1)).alias("__n"))]
    for s in steps[1:]:
        nxt = base.filter(F.col("__t") == s).select(
            F.col("__k").alias("__k2"), F.col("__us").alias("__us2")
        )
        frontier = (
            frontier.join(nxt, F.col("__k") == F.col("__k2"), "inner")
            .filter(F.col("__us2") >= F.col("__at"))
            .groupBy("__k")
            .agg(F.min("__us2").alias("__at"))
        )
        counts.append(frontier.select(F.count(F.lit(1)).alias("__n")))

    rows = None
    for i, c in enumerate(counts):
        tagged = c.select(
            F.lit(i + 1).alias("step_ix"), F.lit(steps[i]).alias("step"), "__n"
        )
        rows = tagged if rows is None else rows.unionByName(tagged)

    # the unioned counts table is <= len(steps) rows; a single-partition
    # window over it is free.  Integer `div` keeps the bp exact in every
    # engine (no float crosses the boundary).
    from pyspark.sql import Window

    w = Window.orderBy("step_ix")
    prev = F.lag("__n").over(w)
    head = F.first("__n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        rows.select(
            "step_ix",
            "step",
            F.col("__n").alias("n_entities"),
            prev.alias("__prev"),
            head.alias("__head"),
        )
        .select(
            "step_ix",
            "step",
            "n_entities",
            F.when(
                F.col("__prev") > 0,
                F.expr("(10000 * n_entities) div __prev"),
            ).alias("conv_from_prev_bp"),
            F.when(
                (F.col("step_ix") > 1) & (F.col("__head") > 0),
                F.expr("(10000 * n_entities) div __head"),
            ).alias("conv_from_first_bp"),
        )
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: entities grouped by first-activity period
    (integer ``epoch // period_s`` bucket), counted per activity-period
    offset.

    Output: ``(cohort_bucket, period_offset, n_active, cohort_size,
    retention_bp)`` — one row per (cohort, offset) that has activity;
    offset 0 is the cohort itself (``retention_bp = 10000`` by
    construction).  ``retention_bp = 10000·n_active // cohort_size``
    (integer division, engine-stable).  NULL keys/timestamps are
    excluded — they have no cohort.

    Buckets are pure integer epoch math — period boundaries are UTC-
    aligned multiples of *period_s* from the epoch, not calendar weeks;
    at 100 TB you want the version that never touches a timezone
    database.

    Plan: one min-aggregate for first-seen, one equi-join back (hashes
    on the same key — co-partitioned), one distinct + groupBy on the
    tiny (cohort, offset) pairs.
    """
    if period_s <= 0:
        raise ValueError("period_s must be positive")
    k = F.col("`%s`" % key_col)
    p_us = int(period_s) * _US
    base = (
        events.filter(k.isNotNull() & F.col("`%s`" % ts_col).isNotNull())
        .select(k.alias("__k"), _micros(events, ts_col).alias("__us"))
        # exact integer floor-div (pmod keeps it floor — not truncate —
        # for pre-epoch timestamps); no double ever touches the bucket
        .select(
            "__k",
            F.expr(
                "(__us - pmod(__us, %d)) div %d" % (p_us, p_us)
            ).alias("__b"),
        )
    )
    first = base.groupBy("__k").agg(F.min("__b").alias("__cohort"))
    active = (
        base.join(first, "__k")
        .select("__k", "__cohort", (F.col("__b") - F.col("__cohort")).alias("__off"))
        .distinct()
    )
    sizes = first.groupBy("__cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    out = (
        active.groupBy("__cohort", "__off")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "__cohort")
    )
    return out.select(
        F.col("__cohort").alias("cohort_bucket"),
        F.col("__off").alias("period_offset"),
        "n_active",
        "cohort_size",
        F.expr("(10000 * n_active) div cohort_size").alias("retention_bp"),
    )


def rolling_active_users(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_buckets: int = 7,
    bucket_s: int = 86400,
) -> DataFrame:
    """Rolling EXACT distinct actives — the 7-day-active-users curve
    computed without approximate sketches: for every *bucket_s* bucket in
    the observed range, how many distinct keys were active in the
    trailing *window_buckets* buckets ending at it (inclusive).

    Output: one row per bucket in ``[min_bucket, max_bucket]`` of live
    data — ``(bucket, daily_users, rolling_users)``; a bucket with no
    events still appears (``daily_users = 0``) and its rolling count
    carries the still-in-window keys of earlier buckets.  NULL keys /
    timestamps are excluded.  Buckets are integer epoch floor-divisions
    (UTC multiples of *bucket_s*, no calendar).

    Exactness via the COVERAGE trick instead of a sliding distinct: a
    key active in bucket ``d`` covers buckets ``d..d+w-1``, so
    ``rolling(b) = |distinct (key, covered=b)|`` — a bounded ``w``-way
    JVM-side ``explode(sequence(...))`` of the DISTINCT (key, bucket)
    pairs, never of the raw events.  Re-aggregable and mergeable the way
    HLL is, but exact.

    Plan: one distinct on (key, bucket) — the only event-cardinality
    shuffle; the explode multiplies pairs (not events) by ``w``; one
    second distinct + count at pair cardinality; the day spine and the
    max-bucket clamp come from a broadcast 1-row bounds aggregate.  At
    100 TB the (key, bucket) distinct is the same shuffle a daily-actives
    job already pays; everything after is ``w×`` that reduced set.
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    k = F.col("`%s`" % key_col)
    b_us = int(bucket_s) * _US
    pairs = (
        events.filter(k.isNotNull() & F.col("`%s`" % ts_col).isNotNull())
        .select(k.alias("__k"), _micros(events, ts_col).alias("__us"))
        .select(
            "__k",
            F.expr("(__us - pmod(__us, %d)) div %d" % (b_us, b_us)).alias("__b"),
        )
        .distinct()
    )
    bounds = pairs.agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    w = int(window_buckets)
    covered = (
        pairs.join(F.broadcast(bounds))
        .select(
            "__k",
            F.explode(
                F.sequence(
                    F.col("__b"),
                    F.least(F.col("__b") + F.lit(w - 1), F.col("__hi")),
                )
            ).alias("__c"),
        )
        .distinct()
        .groupBy("__c")
        .agg(F.count(F.lit(1)).alias("rolling_users"))
    )
    daily = pairs.groupBy("__b").agg(F.count(F.lit(1)).alias("daily_users"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket")
    )
    return (
        spine.join(daily, spine.bucket == daily.__b, "left")
        .join(covered, spine.bucket == covered.__c, "left")
        .select(
            "bucket",
            F.coalesce("daily_users", F.lit(0)).cast("long").alias("daily_users"),
            F.coalesce("rolling_users", F.lit(0)).cast("long").alias("rolling_users"),
        )
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_cols: Sequence[str] = (),
    rare_below_bp: int = 100,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences — which step follows which, and how often: the model
    behind "users who view usually click next" dashboards and the
    rare-transition anomaly gate (a transition observed far below its
    row's norm is a bot path, an instrumentation bug, or a funnel leak).

    Per entity, events are ordered by ``(ts, tiebreak_cols…)`` (pass a
    unique id to pin same-timestamp ties); each CONSECUTIVE pair emits
    one ``prev_type → next_type`` observation.  Output: one row per
    observed ordered pair — ``(prev_type, next_type, n, p_bp, rare)``
    where ``p_bp = 10000·n div Σn(prev_type)`` (the row-conditional
    probability, exact int64) and ``rare = p_bp < rare_below_bp``.
    NULL keys/timestamps are excluded from sequencing; NULL types are
    excluded as states (a NULL state is a validation failure upstream,
    not a Markov state — the events on either side of it do NOT become
    adjacent, matching the lag-over-the-raw-timeline semantics).

    Plan: one window shuffle keyed on the entity for the lag, then a
    map-side-combined groupBy on (prev, next) at TYPE² cardinality and
    a broadcast-sized per-prev roll-up joined back; nothing beyond the
    first exchange moves event-cardinality data.  Hot entities cost one
    sort share, like every other per-entity window here.
    """
    k = F.col("`%s`" % key_col)
    t = F.col("`%s`" % ts_col)
    live = events.filter(k.isNotNull() & t.isNotNull()).select(
        k.alias("__k"),
        _session_micros(events, ts_col).alias("__us"),
        F.col("`%s`" % type_col).alias("__t"),
        *[F.col("`%s`" % c).alias("__tb_%s" % c) for c in tiebreak_cols],
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__k").orderBy(
        F.col("__us").asc(),
        *[F.col("__tb_%s" % c).asc() for c in tiebreak_cols],
    )
    pairs = (
        live.withColumn("__prev", F.lag("__t").over(w))
        .filter(F.col("__prev").isNotNull() & F.col("__t").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_type"), F.col("__t").alias("next_type")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("(10000 * n) div __tot").alias("p_bp"),
            (F.expr("(10000 * n) div __tot") < F.lit(int(rare_below_bp))).alias(
                "rare"
            ),
        )
    )
