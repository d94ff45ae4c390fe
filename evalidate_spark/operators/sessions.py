"""Gap-based event sessionization — the windowed-operator face of the
engine's table checks.

Not in the reference (it has no time, no windows); added because event
streams are a core table shape for training-data pipelines (activity
filtering, per-session quality, leakage splits).  Semantics: per user,
events ordered by timestamp; a gap > *gap* starts a new session; session
index is the running count of session starts.  All time arithmetic is on
exact MICROSECONDS (``unix_micros``) so results are bit-identical across
engines regardless of fractional-second timestamps.

Scale: one window keyed by (user) — Spark partitions the window by the
user hash, so parallelism is #users, never a global sort; the roll-up
reuses the same shuffle partitioning (groupBy on a superset of the window
key adds no exchange).  A pathological single-user stream is the one skew
case: ``session_bounds(split_hours=…)`` pre-splits every user's events
into time buckets, sessionizes within each (user, bucket) — parallelism
becomes #user-buckets, so no task ever sorts one user's whole history —
then stitches sessions across bucket boundaries exactly (a per-user
window over the TINY bucket-summary table assigns each bucket a global
session offset and a merge flag for a first-session that continues the
previous bucket's last session).  The stitched result is identical to the
unsplit path (equivalence-tested).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _micros(df: DataFrame, ts_col: str):
    """Exact epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns.
    NTZ uses ``timestampdiff(MICROSECOND, epoch, ts)`` — pure wall-clock
    arithmetic, INDEPENDENT of the session timezone (NTZ wall-clock ≡ UTC,
    which is also what DuckDB's ``epoch_us`` assumes), so no session conf
    needs pinning for cross-engine parity."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `%s`)"
            % ts_col
        )
    return F.unix_micros(F.col("`%s`" % ts_col))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Append ``session_ix`` (1-based per user) to every event.  NULL-user
    and NULL-timestamp rows pass through with a NULL ``session_ix`` (a
    missing user is a presence violation; a missing timestamp has no
    place on the timeline) — and a NULL-ts row never perturbs the
    numbering of the real events around it."""
    u = F.col("`%s`" % user_col)
    tus = _micros(df, ts_col)
    w = Window.partitionBy(u).orderBy(tus)  # NULL ts sort first (masked)
    prev = F.lag(tus).over(w)
    new_session = F.when(tus.isNull(), F.lit(0)).otherwise(
        (prev.isNull() | (tus - prev > gap_minutes * 60 * 1_000_000)).cast("long")
    )
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    ix = F.sum(new_session).over(running)
    return df.withColumn(
        "session_ix", F.when(u.isNotNull() & tus.isNotNull(), ix)
    )


def session_bounds(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    split_hours: Optional[int] = None,
) -> DataFrame:
    """Per-session roll-up: ``(user, session_ix, n_events, t_start_us,
    t_end_us)`` — the window stage's partitioning is reused by the groupBy
    (same leading key), so the plan has exactly one exchange.

    ``split_hours`` opts into the skew-relief path: events are bucketed by
    ``floor(t / split_hours)`` per user BEFORE the window, so a single hot
    user parallelises across its time buckets instead of serialising one
    straggler task; cross-bucket sessions are stitched exactly (same
    output, equivalence-tested).  Costs two extra small exchanges — pay it
    when one key owns a pathological share of events."""
    if split_hours is not None:
        return _session_bounds_split(df, user_col, ts_col, gap_minutes, split_hours)
    u = F.col("`%s`" % user_col)
    # NULL user → presence violation; NULL ts → no place on the
    # timeline: neither is sessionizable
    nn = df.filter(u.isNotNull() & F.col("`%s`" % ts_col).isNotNull())
    tus = _micros(nn, ts_col)
    s = sessionize(nn, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(u.alias(user_col), "session_ix")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(tus).alias("t_start_us"),
            F.max(tus).alias("t_end_us"),
        )
    )


def _session_bounds_split(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int,
    split_hours: int,
) -> DataFrame:
    """Skew-relief sessionization: window per (user, time-bucket), then an
    exact cross-boundary stitch.

    Let bucket b's local sessions be 1..n_b, ``tf_b``/``tl_b`` its
    first/last event time, and ``m_b`` = 1 iff the bucket's first session
    continues the previous non-empty bucket's last session
    (``tf_b − tl_prev ≤ gap``).  With ``S_b = Σ_{b'≤b} (n_b' − m_b')``
    (global sessions started through bucket b), local session (b, l) has
    global index ``S_{b-1} + l − m_b`` — uniform in l, so the stitch is a
    tiny per-user window over bucket summaries plus one hash join back.
    Sessions spanning 3+ buckets chain naturally (every interior bucket
    contributes n=1, m=1 → zero new sessions)."""
    gap_us = gap_minutes * 60 * 1_000_000
    bucket_us = split_hours * 3600 * 1_000_000
    u = F.col("`%s`" % user_col)
    # NULL user → presence violation; NULL ts → no place on the
    # timeline: neither is sessionizable
    nn = df.filter(u.isNotNull() & F.col("`%s`" % ts_col).isNotNull())
    tus = _micros(nn, ts_col)
    # floor of the double quotient is monotone in t, which is all the
    # stitch needs (buckets time-ordered, boundaries deterministic)
    ev = nn.select(
        u.alias("__u"),
        tus.alias("__t"),
        F.floor(tus / F.lit(bucket_us)).cast("long").alias("__b"),
    )
    w = Window.partitionBy("__u", "__b").orderBy("__t")
    prev = F.lag("__t").over(w)
    new_s = (prev.isNull() | (F.col("__t") - prev > gap_us)).cast("long")
    loc = ev.withColumn(
        "__lix", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # local roll-up + bucket summary reuse the window's (user, bucket)
    # partitioning — no extra exchange for either
    locs = loc.groupBy("__u", "__b", "__lix").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("__t").alias("t_start_us"),
        F.max("__t").alias("t_end_us"),
    )
    summ = locs.groupBy("__u", "__b").agg(
        F.max("__lix").alias("__nloc"),
        F.min("t_start_us").alias("__tf"),
        F.max("t_end_us").alias("__tl"),
    )
    wb = Window.partitionBy("__u").orderBy("__b")
    prev_tl = F.lag("__tl").over(wb)
    summ = summ.withColumn(
        "__m",
        (prev_tl.isNotNull() & (F.col("__tf") - prev_tl <= gap_us)).cast("long"),
    )
    summ = summ.withColumn(
        "__S",
        F.coalesce(
            F.sum(F.col("__nloc") - F.col("__m")).over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    g = locs.join(summ.select("__u", "__b", "__m", "__S"), ["__u", "__b"])
    return (
        g.select(
            F.col("__u").alias(user_col),
            (F.col("__S") + F.col("__lix") - F.col("__m")).alias("session_ix"),
            "n_events",
            "t_start_us",
            "t_end_us",
        )
        .groupBy(user_col, "session_ix")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("t_start_us").alias("t_start_us"),
            F.max("t_end_us").alias("t_end_us"),
        )
    )


def trailing_window_features(
    df: DataFrame,
    window_s: int = 3600,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    flag_col: str = "event_type",
    flag_value: str = "error",
) -> DataFrame:
    """Point-in-time-correct trailing-window features, one row per event:
    for each event, the count / value-sum / flagged-count of the SAME
    key's events with ``ts in [ts - window_s, ts]`` — the classic
    leakage-free feature-generation pass (a model scoring the event may
    only see the past, never the future).

    Output: ``(event_id, user_id, ts_us, n_w, sum_value_w, n_flag_w)``.
    NULL-timestamp rows pass through with NULL features (same
    unsessionizable-by-contract rule as :func:`sessionize`); NULL keys form
    their own partition; NULL values are skipped by the sum (NULL sum when
    the whole frame is NULL).

    Scale shape: ONE shuffle (hash by key), then a single sort powers all
    three RANGE-frame aggregates — Spark evaluates sibling window functions
    over the same (partition, order, frame) in one pass.  Frames are
    integer microsecond ranges (``unix_micros``), so results are
    bit-comparable across engines and DST-proof."""
    us = _micros(df, ts_col)
    ids = F.col("`%s`" % id_col)
    key = F.col("`%s`" % key_col)
    val = F.col("`%s`" % value_col)
    live = df.filter(F.col("`%s`" % ts_col).isNotNull()).select(
        ids.alias("event_id"),
        key.alias("user_id"),
        us.alias("ts_us"),
        val.alias("__v"),
        (F.col("`%s`" % flag_col) == flag_value).alias("__f"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    feats = live.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_w"),
        F.round(F.sum("__v").over(w), 6).alias("sum_value_w"),
        F.coalesce(
            F.sum(F.when(F.col("__f"), 1)).over(w), F.lit(0)
        ).cast("long").alias("n_flag_w"),
    )
    masked = df.filter(F.col("`%s`" % ts_col).isNull()).select(
        ids.alias("event_id"),
        key.alias("user_id"),
        F.lit(None).cast("long").alias("ts_us"),
        F.lit(None).cast("long").alias("n_w"),
        F.lit(None).cast("double").alias("sum_value_w"),
        F.lit(None).cast("long").alias("n_flag_w"),
    )
    return feats.unionByName(masked)


def sequence_anomalies(
    df: DataFrame,
    entity_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
    max_gap_us: Optional[int] = None,
) -> DataFrame:
    """Per-entity event-sequence integrity check — the temporal sibling of
    the span-order validator (spans.py validates offsets WITHIN a row;
    this validates the event stream ACROSS rows).  Events are ordered by
    ``(seq, ts)`` within each entity; every adjacent pair is classified
    and at most one anomaly row ``(entity, seq, kind, measure)`` is
    emitted per adjacency, priority-ordered:

    * ``duplicate_seq`` — the sequence number repeats (same *seq* as the
      previous event); ``measure`` = µs between the clashing events.
    * ``ts_regression`` — *seq* advanced but the timestamp went BACKWARD
      (clock skew, replayed batch); ``measure`` = µs of regression (> 0).
    * ``gap`` — the timestamp jumped forward by more than *max_gap_us*
      (dropped data, dead collector); ``measure`` = the gap in µs.  Only
      checked when *max_gap_us* is set.

    Rows with a NULL entity, seq, or timestamp are excluded: each missing
    field is a presence violation for the engine's rules, and a row with
    no position on the sequence axis can't be adjudicated here.  Ordering
    by ``(seq, ts)`` makes the output a deterministic multiset even when
    sequence numbers collide (tied rows are interchangeable).

    Scale: ONE window keyed by entity — one shuffle, parallelism =
    #entities, all three kinds read the same two lag() values; no
    self-join, no second aggregation."""
    ent = F.col("`%s`" % entity_col)
    seq = F.col("`%s`" % seq_col)
    tus = _micros(df, ts_col)
    base = df.filter(
        ent.isNotNull() & seq.isNotNull() & tus.isNotNull()
    ).select(
        ent.alias("entity"), seq.alias("seq"), tus.alias("__t")
    )
    w = Window.partitionBy("entity").orderBy("seq", "__t")
    prev_seq = F.lag("seq").over(w)
    prev_t = F.lag("__t").over(w)
    t = F.col("__t")
    is_dup = F.col("seq") == prev_seq
    is_reg = prev_t > t
    is_gap = (
        (t - prev_t > F.lit(int(max_gap_us)))
        if max_gap_us is not None
        else F.lit(False)
    )
    kind = (
        F.when(is_dup, F.lit("duplicate_seq"))
        .when(is_reg, F.lit("ts_regression"))
        .when(is_gap, F.lit("gap"))
    )
    measure = (
        F.when(is_dup, t - prev_t)
        .when(is_reg, prev_t - t)
        .otherwise(t - prev_t)
        .cast("long")
    )
    return (
        base.select(
            "entity",
            "seq",
            prev_seq.alias("__ps"),
            kind.alias("kind"),
            measure.alias("measure"),
        )
        .filter(F.col("__ps").isNotNull() & F.col("kind").isNotNull())
        .drop("__ps")
    )


def suppress_repeats(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "event_type",
    window_s: int = 3600,
    order_col: str = "event_id",
) -> DataFrame:
    """Telemetry repeat-suppression: flag events that repeat the previous
    event's *value_col* within *window_s* seconds for the same key — the
    standard at-source dedup/compaction pass for event streams (retries,
    double-clicks, heartbeat spam).

    Consecutive semantics: an event is ``kept = false`` iff its immediate
    predecessor in ``(ts, order_col)`` order within the key partition has
    a null-safe-equal value and lies within the window.  *order_col*
    breaks same-timestamp ties deterministically; it must name an
    existing (unique-per-key) column — a silent fallback to ordering by
    ts twice would make equal-ts results partition-order dependent.  One hash shuffle
    on the key + one sort — the same single-window shape as
    :func:`sessionize`; at corpus scale the partition key spreads by
    user, and a pathological single-key stream is pre-split exactly like
    ``sessionize(split_hours=...)`` upstream.

    NULL contracts (replayed verbatim by the oracle): NULL-ts events are
    always kept and never suppress a successor (no timeline position);
    NULL keys form their own partition like SQL window PARTITION BY;
    NULL values compare null-safe, so two consecutive NULL values within
    the window DO suppress.
    """
    if order_col not in df.columns:
        raise ValueError(
            "suppress_repeats: tie-break column %r not in input; pass "
            "order_col=<your unique event id column>" % order_col
        )
    tus = _micros(df, ts_col)
    keys = [F.col("`%s`" % k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        tus.asc_nulls_first(), F.col("`%s`" % order_col).asc_nulls_first()
    )
    val = F.col("`%s`" % value_col)
    pv = F.lag(val).over(w)
    pt = F.lag(tus).over(w)
    suppressed = F.coalesce(
        pt.isNotNull()
        & tus.isNotNull()
        & val.eqNullSafe(pv)
        & (tus - pt <= F.lit(int(window_s) * 1_000_000)),
        F.lit(False),
    )
    return df.withColumn("kept", ~suppressed)


def gap_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    quantiles: Sequence[int] = (50, 90),
) -> DataFrame:
    """Per-entity inter-arrival gap statistics — the heartbeat-health
    profile behind every "is this feed steady or bursty?" question:
    for each entity, the distribution of µs gaps between its CONSECUTIVE
    timestamped events.

    Output: one row per entity — ``(entity, n_events, n_gaps,
    min_gap_us, p<q>_gap_us..., max_gap_us, mean_gap_us)``.  Quantiles
    are EXACT lower order statistics (index ``ceil(q·n/100)`` of the
    ascending gaps, pure integer math — never an interpolated or
    sketched percentile, so the result is engine-stable and
    SQL-replayable).  ``mean_gap_us`` is integer ``sum div n``.  NULL
    timestamps are excluded from the timeline; a single-event entity
    reports ``n_gaps = 0`` with NULL gap columns; NULL entities group
    like SQL.

    Plan: ONE hash shuffle on the entity; the lag() that makes gaps and
    the row_number() that ranks them are windows over the SAME
    partitioning (two sorts, one exchange), then one map-side-combined
    aggregate picks each order statistic with a conditional max — no
    join, no collect, no percentile_approx.  Hot entities cost their
    event share of the two sorts; nothing is ever materialized per
    entity but the final row.
    """
    qs = sorted(set(int(q) for q in quantiles))
    if any(q < 1 or q > 100 for q in qs):
        raise ValueError("quantiles must be integer percents in 1..100")
    e = F.col("`%s`" % entity_col)
    tus = _micros(df, ts_col)
    live = df.filter(F.col("`%s`" % ts_col).isNotNull()).select(
        e.alias("__e"), tus.alias("__t")
    )
    w_time = Window.partitionBy("__e").orderBy(F.col("__t").asc())
    gapped = live.withColumn("__gap", F.col("__t") - F.lag("__t").over(w_time))
    # each entity's FIRST event has a NULL gap and sorts first under
    # asc_nulls_first, consuming rank 1 — exactly one per entity (live
    # rows all have a timestamp), so real-gap ranks are row_number - 1
    w_rank = Window.partitionBy("__e").orderBy(F.col("__gap").asc_nulls_first())
    # the gap count rides the SAME (partition, order) spec with an
    # unbounded frame, so rank and count evaluate in ONE Window operator
    # — a separate unordered window would add a third pass over the sort
    w_ng = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = gapped.select(
        "__e",
        "__gap",
        F.when(
            F.col("__gap").isNotNull(), F.row_number().over(w_rank) - 1
        ).alias("__rn"),
        F.count("__gap").over(w_ng).alias("__ng"),
    )
    # each order-statistic pick compares the rank to the ceil index —
    # a function of the WINDOWED gap count, constant within the entity —
    # so one conditional max per quantile inside a single aggregate
    sel_aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(F.max("__ng"), F.lit(0)).cast("long").alias("n_gaps"),
        F.min("__gap").alias("min_gap_us"),
    ]
    for q in qs:
        pick = F.when(
            F.col("__rn") == F.expr("(%d * __ng + 99) div 100" % q),
            F.col("__gap"),
        )
        sel_aggs.append(F.max(pick).alias("p%d_gap_us" % q))
    sel_aggs.append(F.max("__gap").alias("max_gap_us"))
    sel_aggs.append(
        F.expr("sum(__gap) div max(__ng)").alias("mean_gap_us")
    )
    return ranked.groupBy(F.col("__e").alias(entity_col)).agg(*sel_aggs)


def resample_locf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    step_s: int = 3600,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Regular-grid resampling with last-observation-carried-forward —
    the irregular-events → feature-grid step every point-in-time
    training pipeline needs (turn raw events into "the value of X as of
    every hour", then as-of join the grid leakage-free).

    Per key: bucket index ``b = floor(µs / step)``; one row per bucket
    from the key's FIRST observed bucket to the GLOBAL max observed
    bucket (so every entity has a value at every as-of instant after it
    first appears — the grid a feature store serves).  The value at a
    bucket is the latest observation in or before it: within a bucket
    the winner is max ``(ts, tiebreak_cols…)`` (callers pass a unique
    column, e.g. an event id, to pin ties); *value_cols* may be NULL and
    carry forward as NULL.  Output: ``(key…, bucket_start_us,
    value_cols…, carried)`` with ``carried = true`` on filled (not
    observed) buckets.  NULL key or timestamp rows are dropped.

    Plan: ONE groupBy (key, bucket) with ``max_by(struct(values),
    struct(ts, tiebreaks))`` — map-side combined, so the only
    event-cardinality shuffle reduces to bucket cardinality — then a
    lead() window per key over the REDUCED set and an
    ``explode(sequence(b, next_b - 1))`` whose output cardinality IS the
    grid being built (never events × grid).  The global max bucket is a
    broadcast 1-row aggregate.  At 100 TB the grid dominates only if
    step ≪ event spacing — the explode emits exactly the rows the sink
    stores, which is the floor for any engine.
    """
    if not key_cols:
        raise ValueError("resample_locf needs key_cols")
    if not value_cols:
        raise ValueError("resample_locf needs value_cols")
    if step_s <= 0:
        raise ValueError("step_s must be positive")
    step_us = int(step_s) * 1_000_000
    keys = [F.col("`%s`" % k) for k in key_cols]
    live = df.filter(
        F.col("`%s`" % ts_col).isNotNull()
        & F.lit(True)
        & F.expr(
            " AND ".join("`%s` IS NOT NULL" % k for k in key_cols)
        )
    ).select(
        *[k.alias("__k%d" % i) for i, k in enumerate(keys)],
        _micros(df, ts_col).alias("__us"),
        *[F.col("`%s`" % c).alias("__v_%s" % c) for c in value_cols],
        *[F.col("`%s`" % c).alias("__t_%s" % c) for c in tiebreak_cols],
    )
    kcols = ["__k%d" % i for i in range(len(keys))]
    bucketed = live.withColumn(
        "__b", F.expr("(__us - pmod(__us, %d)) div %d" % (step_us, step_us))
    )
    ordkey = F.struct(
        F.col("__us"), *[F.col("__t_%s" % c) for c in tiebreak_cols]
    )
    last = bucketed.groupBy(*kcols, "__b").agg(
        F.max_by(
            F.struct(*[F.col("__v_%s" % c) for c in value_cols]), ordkey
        ).alias("__vals")
    )
    gmax = last.agg(F.max("__b").alias("__gmax"))
    w = Window.partitionBy(*kcols).orderBy(F.col("__b").asc())
    spanned = (
        last.crossJoin(F.broadcast(gmax))
        .withColumn(
            "__ub", F.coalesce(F.lead("__b").over(w) - 1, F.col("__gmax"))
        )
        .select(
            *kcols,
            "__b",
            "__vals",
            F.explode(F.expr("sequence(__b, __ub)")).alias("__g"),
        )
    )
    return spanned.select(
        *[F.col(kc).alias(k) for kc, k in zip(kcols, key_cols)],
        (F.col("__g") * F.lit(step_us)).cast("long").alias("bucket_start_us"),
        *[F.col("__vals.`__v_%s`" % c).alias(c) for c in value_cols],
        (F.col("__g") > F.col("__b")).alias("carried"),
    )
