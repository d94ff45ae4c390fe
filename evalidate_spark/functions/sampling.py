"""Deterministic corpus sampling and sequence packing — the selection
operators of a training-data pipeline.

Randomness here is HASH-derived, never RNG-derived: a sample defined by
``md5(id) < threshold`` is reproducible across runs, engines, cluster
sizes, and partitionings, can be audited by an external SQL engine, and
composes (a 1% sample is a subset of the 10% sample with the same salt).
``df.sample()`` guarantees none of that — its output depends on partition
layout and seed plumbing.  (The reference engine has no sampling surface;
these are north-rule pipeline additions.)

* :func:`sample_deterministic` — stateless hash-threshold Bernoulli
  sample.  NO shuffle, no state: a pure filter that pushes into the scan
  stage, so at 10^12 docs it costs one comparison per row.
* :func:`sample_stratified` — exact per-stratum quotas (e.g. "50k docs
  per language"): rank by hash within each stratum, keep the quota.  One
  shuffle on the stratum key; quota rows per stratum are what survive, so
  skewed strata cost sort time, not memory (row_number is streaming).
* :func:`pack_sequences` — pretraining-style sequence packing: documents
  are concatenated in deterministic order within a shard and chunked
  every ``budget`` tokens; a doc belongs to the sequence where it STARTS
  (docs may cross boundaries, as in standard LM data loaders).  One
  window + one roll-up on the same shard key = one shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import token_count


def _bucket_hash(id_col: Column, salt: str) -> Column:
    """Uniform bucket from md5(salt || id): the FIRST 8 HEX CHARS as a
    string.  Lowercase-hex lexicographic order ≡ numeric order, so
    thresholds and ranks work in string space — and any SQL engine with
    md5() can replay the exact sample (xxhash64 has no DuckDB twin; hex
    string-compare avoids needing a conv/from_hex twin too)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8
    )


def sample_deterministic(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Keep rows whose salted id-hash falls below ``fraction`` of the hash
    space.  Stateless + stable: the same row is in or out regardless of
    partitioning or cluster size, and samples nest across fractions for a
    fixed salt.  NULL ids are excluded (hash undefined ⇒ not sampled)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    b = int(fraction * (1 << 32))
    # 'g' sorts above every hex char, so fraction=1.0 keeps all rows
    bound = "g" if b >= (1 << 32) else "%08x" % b
    return df.filter(_bucket_hash(F.col("`%s`" % id_col), salt) < F.lit(bound))


def sample_stratified(
    df: DataFrame,
    stratum_col: str,
    quota: int,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Exactly ``min(quota, |stratum|)`` rows per stratum, chosen by
    salted-hash rank (id tiebreak) — deterministic quota sampling for
    per-language / per-source corpus balancing.  NULL ids are excluded;
    NULL strata form their own stratum (they are a real corpus slice)."""
    if quota <= 0:
        raise ValueError("quota must be positive")
    ids = F.col("`%s`" % id_col)
    h = _bucket_hash(ids, salt)
    w = Window.partitionBy(F.col("`%s`" % stratum_col)).orderBy(h, ids)
    return (
        df.filter(ids.isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    shard_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_col: Optional[str] = None,
) -> DataFrame:
    """Assign each doc a ``seq_ix``: concatenate docs in ``id_col`` order
    per shard and cut every ``budget`` tokens; a doc's sequence is where
    its first token lands.  Returns per-sequence rows ``(shard, seq_ix,
    n_docs, seq_tokens)``.

    ``count_col`` reuses a precomputed token count; default counts
    whitespace tokens via :func:`~evalidate_spark.functions.text.token_count`.
    Docs with NULL id/shard are excluded (not packable deterministically).
    Parallelism is #shards — pick the shard key accordingly (e.g.
    ``source``, a date bucket, or ``pmod(hash(id), N)`` upstream)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    ids = F.col("`%s`" % id_col)
    sh = F.col("`%s`" % shard_col)
    ntok = (
        F.col("`%s`" % count_col)
        if count_col
        else token_count(F.col("`%s`" % text_col))
    ).cast("long")
    base = df.filter(ids.isNotNull() & sh.isNotNull()).select(
        sh.alias("shard"), ids.alias("__id"), ntok.alias("__n")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("__n").over(w), F.lit(0))
    packed = base.select(
        "shard",
        "__n",
        F.floor(start / F.lit(int(budget))).cast("long").alias("seq_ix"),
    )
    # groupBy on (shard, seq_ix) reuses the window's shard partitioning —
    # one exchange total
    return packed.groupBy("shard", "seq_ix").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n").alias("seq_tokens"),
    )
