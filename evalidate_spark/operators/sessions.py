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
user hash, so parallelism is #users, never a global sort; a pathological
single-user stream is the one skew case (mitigate upstream by splitting
that user by day before sessionizing).  The roll-up reuses the same
shuffle partitioning (groupBy on a superset of the window key adds no
exchange).
"""

from __future__ import annotations

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
    rows pass through with a NULL ``session_ix`` (they are presence
    violations, not activity)."""
    u = F.col("`%s`" % user_col)
    tus = _micros(df, ts_col)
    w = Window.partitionBy(u).orderBy(tus)
    prev = F.lag(tus).over(w)
    new_session = (
        prev.isNull() | (tus - prev > gap_minutes * 60 * 1_000_000)
    ).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    ix = F.sum(new_session).over(running)
    return df.withColumn("session_ix", F.when(u.isNotNull(), ix))


def session_bounds(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session roll-up: ``(user, session_ix, n_events, t_start_us,
    t_end_us)`` — the window stage's partitioning is reused by the groupBy
    (same leading key), so the plan has exactly one exchange."""
    u = F.col("`%s`" % user_col)
    nn = df.filter(u.isNotNull())
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
