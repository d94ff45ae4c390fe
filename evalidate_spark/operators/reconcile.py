"""Cross-version and cross-table reconciliation — the regression-testing
operators of a validation engine.

A validation engine doesn't just gate one table; it answers "did this
pipeline change break the data?"  Four operators cover that surface:

- :func:`table_diff` — row-level diff of two versions of a table by key:
  which rows were added / removed / changed, and WHICH columns changed.
  The snapshot-regression primitive (diff a rerun against the blessed
  output, diff two Iceberg snapshots via ``sources.read_table``).
- :func:`reconcile_sums` — cross-table aggregate reconciliation: per-key
  fact-side aggregates vs the value stored on a dimension/summary table
  (the accounting identity "order total == Σ line items").  All sums run
  in DECIMAL so the result is exact and order-independent — a float sum
  is neither, and a reconciliation report that depends on partition
  order is worthless.
- :func:`changelog_compact` — CDC compaction: latest row per key from an
  append-only changelog, honoring delete markers.  The "current state"
  view every upsert pipeline needs before validating.
- :func:`survivorship` — golden-record merge over duplicate clusters
  (the step AFTER :func:`~evalidate_spark.functions.dedup.fuzzy_matches`
  + ``duplicate_clusters``): one canonical row per cluster by an explicit
  deterministic precedence, with per-field first-non-null fill so the
  merged record is as complete as the cluster allows.

The reference engine is row-local (``/root/reference/src/evalidate.erl``
validates one value against one rule); these are north-rule pipeline
additions like :mod:`.sessions` and :mod:`.asof`.

Scale notes
-----------
``table_diff`` is ONE full-outer sort-merge join on the key — the minimum
for a keyed diff; if both versions are written bucketed by the key
(``sources.write_bucketed``) the exchange disappears entirely.
``reconcile_sums`` is one map-side-combined aggregate on the fact plus an
equi-join to the (much smaller) summary side.  ``changelog_compact`` and
``survivorship`` are one hash shuffle + one window each — the
:mod:`.sessions` shape, with the same hot-key caveat (a single key that
owns the changelog serialises its own timeline only).  Nothing here
collects, explodes, or multiplies rows.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def table_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Row-level diff ``before`` → ``after`` keyed by *key_cols*.

    Returns one row per key that differs, with ``change`` in
    ``('added', 'removed', 'changed')`` and ``changed_cols`` — the
    NAME-SORTED comma-joined list of *compare_cols* whose values are not
    null-safe-equal (empty string for added/removed rows).  Keys present
    in both versions with all compared columns equal produce NO row, so
    an empty result IS the regression gate "nothing changed".

    *compare_cols* defaults to every shared non-key column.  Comparison
    is null-safe (NULL == NULL holds; NULL vs value is a change).  Rows
    with a NULL in any key column can never pair across versions, so
    they surface as one removed + one added row — the honest reading,
    and the same answer a SQL FULL OUTER JOIN gives.

    Keys must be unique per side (it's a keyed diff); duplicated keys
    raise downstream in the caller's uniqueness check, not here — run
    ``uniqueness_violations`` first if unsure.

    Plan: one full-outer join on the key, everything else is null-safe
    column expressions folded into the join's projection.  No second
    scan, no explode.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("table_diff needs at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in before.columns if c not in keys and c in after.columns
        ]
    cols = list(compare_cols)
    missing = [c for c in keys + cols if c not in before.columns or c not in after.columns]
    if missing:
        raise ValueError("table_diff: columns missing on one side: %s" % missing)

    b = before.select(
        *[F.col("`%s`" % k).alias("__bk_%s" % k) for k in keys],
        F.lit(True).alias("__b_present"),
        *[F.col("`%s`" % c).alias("__b_%s" % c) for c in cols],
    )
    a = after.select(
        *[F.col("`%s`" % k).alias("__ak_%s" % k) for k in keys],
        F.lit(True).alias("__a_present"),
        *[F.col("`%s`" % c).alias("__a_%s" % c) for c in cols],
    )
    cond = None
    for k in keys:
        c = F.col("__bk_%s" % k) == F.col("__ak_%s" % k)
        cond = c if cond is None else (cond & c)
    j = b.join(a, cond, "full_outer")

    added = F.col("__b_present").isNull()
    removed = F.col("__a_present").isNull()
    diffs = [
        F.when(
            ~F.col("__b_%s" % c).eqNullSafe(F.col("__a_%s" % c)), F.lit(c)
        )
        for c in sorted(cols)
    ]
    changed_list = (
        F.filter(F.array(*diffs), lambda x: x.isNotNull())
        if diffs
        else F.array().cast("array<string>")
    )
    change = (
        F.when(added, F.lit("added"))
        .when(removed, F.lit("removed"))
        .when(F.size(changed_list) > 0, F.lit("changed"))
    )
    return (
        j.select(
            *[
                F.coalesce(F.col("__bk_%s" % k), F.col("__ak_%s" % k)).alias(k)
                for k in keys
            ],
            change.alias("change"),
            F.when(added | removed, F.lit("")).otherwise(
                F.array_join(changed_list, ",")
            ).alias("changed_cols"),
        )
        .filter(F.col("change").isNotNull())
    )


def reconcile_sums(
    fact: DataFrame,
    summary: DataFrame,
    fact_key: str,
    summary_key: str,
    fact_value: str,
    summary_value: str,
    scale: int = 2,
    tolerance: str = "0",
) -> DataFrame:
    """Per-key reconciliation of ``Σ fact[fact_value]`` against the value
    stored on *summary* — the accounting-identity check ("order total
    must equal the sum of its line items").

    Both sides are cast to ``decimal(38, scale)`` BEFORE aggregating, so
    the sums are exact and independent of partition/merge order — a
    float sum changes with parallelism, which would make the mismatch
    report flap run-to-run on identical data.  *tolerance* (a decimal
    string, e.g. ``'0.01'``) absorbs intended rounding.

    Output: one row per summary key — ``(key, n_fact_rows, fact_sum,
    summary_value, diff, matched)`` where ``diff = fact_sum − stored``
    and ``matched = |diff| <= tolerance``.  Summary keys with NO fact
    rows report ``n_fact_rows = 0`` and a NULL ``fact_sum`` (absence is
    its own finding, distinct from an exact zero sum); fact rows whose
    key misses the summary are a referential violation, not a
    reconciliation row — run ``referential_violations`` for those.
    NULL fact values sum like SQL (ignored); an all-NULL key keeps a
    NULL sum.

    Plan: map-side-combined aggregate on the fact (one shuffle at fact
    cardinality-of-keys, not row count) + one equi-join to the summary —
    broadcastable when the summary side is small, AQE decides.
    """
    dec = "decimal(38,%d)" % int(scale)
    fk = F.col("`%s`" % fact_key)
    agg = (
        fact.filter(fk.isNotNull())
        .groupBy(fk.alias("__k"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("`%s`" % fact_value).cast(dec)).alias("__sum"),
        )
    )
    sk = F.col("`%s`" % summary_key)
    j = (
        summary.filter(sk.isNotNull())
        .select(
            sk.alias("__sk"),
            F.col("`%s`" % summary_value).cast(dec).alias("__stored"),
        )
        .join(agg, F.col("__sk") == F.col("__k"), "left")
    )
    diff = F.col("__sum") - F.col("__stored")
    tol = F.lit(tolerance).cast(dec)
    return j.select(
        F.col("__sk").alias(summary_key),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_fact_rows"),
        F.col("__sum").alias("fact_sum"),
        F.col("__stored").alias("stored_value"),
        diff.alias("diff"),
        F.when(diff.isNull(), F.lit(False))
        .otherwise(F.abs(diff) <= tol)
        .alias("matched"),
    )


def changelog_compact(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: Optional[str] = None,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """CDC compaction: the LATEST row per key from an append-only
    changelog, by descending *order_cols* precedence (e.g. ``(ts,
    seq)``) — then rows whose *op_col* is a delete marker are dropped,
    so a key whose latest entry is a delete vanishes from the compacted
    state (upsert-then-delete semantics, the Kafka-compaction /
    Iceberg-MoR contract).

    *order_cols* must totally order rows within a key (add a unique
    sequence column as the last tie-break); ties would otherwise make
    "latest" partition-order dependent — the same contract as
    :func:`~.sessions.suppress_repeats`.  NULLs order FIRST ascending,
    i.e. a NULL order value never wins over a real one.  NULL keys
    compact like SQL GROUP BY (one NULL-key group).

    Plan: one hash shuffle on the key + one window sort, then the
    delete filter — no join, no second pass.
    """
    keys = [F.col("`%s`" % k) for k in key_cols]
    order = [F.col("`%s`" % c).desc_nulls_last() for c in order_cols]
    if not order:
        raise ValueError("changelog_compact needs at least one order column")
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        out = out.filter(
            ~F.coalesce(
                F.col("`%s`" % op_col).isin(list(delete_ops)), F.lit(False)
            )
        )
    return out


def survivorship(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    precedence: Sequence = (),
    fill_cols: Sequence[str] = (),
) -> DataFrame:
    """Golden-record merge: one canonical row per duplicate cluster.

    *clusters* is the ``(id, cluster_id)`` map produced by
    ``duplicate_clusters`` (it lists only ids that HAVE duplicates);
    unlisted rows are their own singleton cluster.  Within a cluster the
    surviving row is the first under *precedence* (a sequence of Columns,
    e.g. ``[F.length('text').desc(), F.col('doc_id').asc()]``) — ALWAYS
    terminated by a unique tie-break, or survivorship is
    partition-order-dependent.  Each *fill_cols* column is then
    completed with the first NON-NULL value in the same precedence
    order, so the golden record inherits fields its survivor is missing
    from lower-ranked duplicates.

    Output: the merged row per cluster plus ``cluster_id`` and
    ``n_members``.  NULL-id rows can't join the cluster map and are
    dropped (they have no identity to merge under — surface them with a
    presence rule first).

    Plan: one id-keyed equi-join against the (duplicates-only) cluster
    map — AQE broadcasts it when small — then ONE hash shuffle on
    ``cluster_id`` with a single window doing rank, fills, and the
    member count together.  No per-field joins, no collect.
    """
    if not precedence:
        raise ValueError(
            "survivorship needs an explicit precedence (end with a unique "
            "tie-break column)"
        )
    ids = F.col("`%s`" % id_col)
    lab = clusters.select(
        F.col("id").alias("__sv_id"), F.col("cluster_id").alias("__sv_c")
    )
    j = df.filter(ids.isNotNull()).join(lab, ids == F.col("__sv_id"), "left")
    cluster = F.coalesce(F.col("__sv_c"), ids.cast("string"))
    w = Window.partitionBy(cluster).orderBy(*precedence)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    filled = {
        c: F.first(F.col("`%s`" % c), ignorenulls=True).over(full)
        for c in fill_cols
    }
    out_cols = [
        (filled[c] if c in filled else F.col("`%s`" % c)).alias(c)
        for c in df.columns
    ]
    return (
        j.select(
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(full).alias("n_members"),
            cluster.alias("cluster_id"),
            *out_cols,
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse an append-only
    changelog into per-key VALIDITY INTERVALS — one row per value
    *change*, carrying ``valid_from_us`` / ``valid_to_us`` (epoch µs,
    half-open ``[from, to)``), ``version_ix`` (1-based change ordinal)
    and ``is_current`` (open-ended interval).  The complement of
    :func:`changelog_compact`: compact keeps only the latest state,
    SCD2 keeps the full history queryable by as-of time.

    Rows are ordered per key by ``(ts, *order_cols)`` ascending, NULLs
    FIRST (an untimestamped bootstrap row becomes the earliest version,
    ``valid_from_us`` NULL).  A row opens a new version iff it is the
    key's first or ANY *value_cols* differs null-safe from the previous
    row — consecutive duplicates never mint versions (the
    suppress_repeats contract applied to dimension state).  End
    *order_cols* with a unique tie-break or version order is
    partition-order dependent.  NULL keys group like SQL.

    Plan: ONE hash shuffle on the key + one sort; the change filter and
    the lead() that closes each interval are sibling windows over the
    SAME partitioning (the post-filter window re-sorts only the reduced
    change rows, no second exchange).  At 100 TB this is the same cost
    profile as changelog compaction — dimension keys are the shuffle
    unit, hot keys cost their event share, nothing is collected.
    """
    if not key_cols or not value_cols:
        raise ValueError("scd2_intervals needs key_cols and value_cols")
    keys = [F.col("`%s`" % k) for k in key_cols]
    order = [F.col("`%s`" % ts_col).asc_nulls_first()] + [
        F.col("`%s`" % c).asc_nulls_first() for c in order_cols
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    from .sessions import _micros

    t_us = _micros(df, ts_col)
    same = F.lit(True)
    for v in value_cols:
        c = F.col("`%s`" % v)
        same = same & c.eqNullSafe(F.lag(c).over(w))
    changes = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__from", t_us)
        .withColumn("__same", same)
        .filter((F.col("__rn") == 1) | ~F.col("__same"))
        .drop("__same")
    )
    w2 = Window.partitionBy(*keys).orderBy(
        F.col("__from").asc_nulls_first(), F.col("__rn").asc()
    )
    to_us = F.lead("__from").over(w2)
    return changes.select(
        *[F.col("`%s`" % k) for k in key_cols],
        *[F.col("`%s`" % v) for v in value_cols],
        F.col("__from").alias("valid_from_us"),
        to_us.alias("valid_to_us"),
        F.row_number().over(w2).alias("version_ix"),
        # positional: a NULL-ts successor must still CLOSE this version
        # (its valid_to is NULL but it is not current)
        F.lead(F.lit(1)).over(w2).isNull().alias("is_current"),
    )
