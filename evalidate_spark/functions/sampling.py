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
* :func:`rebalance_mixture` — temperature-flatten a crawl-skewed mix:
  per-group quotas ∝ |group|^alpha, smallest group kept whole, selection
  by hash rank.  One data shuffle; quotas broadcast.
* :func:`pack_sequences` — pretraining-style sequence packing: documents
  are concatenated in deterministic order within a shard and chunked
  every ``budget`` tokens; a doc belongs to the sequence where it STARTS
  (docs may cross boundaries, as in standard LM data loaders).  One
  window + one roll-up on the same shard key = one shuffle.
* :func:`select_until_budget` — "best docs until N tokens": global
  score-ordered prefix under a token budget, computed as a distributed
  two-pass prefix sum (range shuffle + broadcast slice offsets) instead
  of a single-task global window.
* :func:`split_by_cluster` — leakage-free train/holdout split: the split
  is hashed from the duplicate-cluster representative, so near-dups of
  training docs can never leak into holdout.
* :func:`weighted_sample` — Efraimidis–Spirakis priority sampling: a
  weighted sample WITHOUT replacement (inclusion odds ∝ weight) from one
  hash-derived key per row and a top-k, globally or per stratum.
* :func:`shuffle_plan` / :func:`shuffled_export` — deterministic global
  epoch shuffle: every row gets a ``(shard, pos)`` coordinate derived
  from ``md5(salt:epoch:id)``, so the trainer's read order is
  pseudo-random yet bit-reproducible across runs, engines, and cluster
  sizes; bumping ``epoch`` re-deals the whole corpus.
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


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    order_col: str,
    descending: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the best *cap* rows per key, ranked on *order_col* (desc by
    default) with an id tiebreak — the C4-style per-domain cap that stops
    one crawled site from dominating the training mix.  One window rank
    per key partition (the sort spills; nothing else is stateful), same
    skew profile as any per-key window — pre-split pathological keys
    upstream if one domain is >1 partition of data.

    NULL ids are excluded (no deterministic tiebreak without an id);
    NULL keys form their own group — a real corpus slice, same stance as
    :func:`sample_stratified`.  NULL ``order_col`` values rank LAST
    regardless of direction (an unknown score never beats a known one)."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    ids = F.col("`%s`" % id_col)
    oc = F.col("`%s`" % order_col)
    order = oc.desc_nulls_last() if descending else oc.asc_nulls_last()
    w = Window.partitionBy(F.col("`%s`" % key_col)).orderBy(order, ids.asc())
    return (
        df.filter(ids.isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def rebalance_mixture(
    df: DataFrame,
    key_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Temperature-rebalance the corpus mix: downsample each ``key_col``
    group (source/domain/language) so kept counts are ∝ |group|^alpha —
    the standard multiplicative flattening of a crawl-skewed training mix
    (alpha=1 keeps the natural mix, alpha→0 approaches uniform).  Pure
    downsampling: the quota is scaled so the SMALLEST group is kept whole
    (quota_k = floor(|k|^alpha · |min|^(1-alpha)), i.e. t = |min|^(1-alpha)),
    never upsampled.

    Selection within a group is exact-quota by salted-hash rank with id
    tiebreak (the :func:`sample_stratified` machinery), so the output is
    deterministic across runs, partitionings, and cluster sizes, and an
    external SQL engine can replay it.  alpha=0.5 and alpha=1.0 are
    bit-replayable cross-engine (sqrt is IEEE-correctly-rounded; pow for
    other alphas may differ by 1 ulp between libm and the JVM on quota
    boundaries).

    Plan: one count aggregate per key (tiny), one ≤#keys-row min, quotas
    broadcast back, one window rank on the key — a single data shuffle.
    Dominant keys make big window partitions (the sort spills, state is
    O(1)); that dominance is exactly what this operator removes, so
    downstream stages see the flattened sizes.  NULL ids are excluded;
    NULL keys form their own group (same stance as
    :func:`sample_stratified`)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    ids = F.col("`%s`" % id_col)
    key = F.col("`%s`" % key_col)
    base = df.filter(ids.isNotNull())
    counts = base.groupBy(key.alias("__k")).agg(F.count(F.lit(1)).alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    c, cm = F.col("__c"), F.col("__cmin")
    if alpha == 1.0:
        quota = c
    elif alpha == 0.5:
        # sqrt(c)*sqrt(cm), NOT sqrt(c*cm): the int64 product overflows
        # at ~3e9-row groups (ANSI crash / silent NaN quota); and clamp
        # like the pow path — the PRODUCT of two correctly-rounded sqrts
        # can land 1 ulp low and floor to c-1 on min-size groups
        raw = F.floor(F.sqrt(c) * F.sqrt(cm))
        quota = F.least(c, F.greatest(raw, F.when(c == cm, c)))
    else:
        # pow is not correctly rounded: c^alpha * cm^(1-alpha) for c == cm
        # can come out at c - 1ulp and floor to c-1, silently dropping rows
        # from every min-size group — clamp to the documented invariants
        # (smallest group kept whole, never more than the group)
        raw = F.floor(F.pow(c, F.lit(alpha)) * F.pow(cm, F.lit(1.0 - alpha)))
        quota = F.least(c, F.greatest(raw, F.when(c == cm, c)))
    quotas = counts.crossJoin(F.broadcast(cmin)).select(
        "__k", quota.cast("long").alias("__quota")
    )
    h = _bucket_hash(ids, salt)
    w = Window.partitionBy(key).orderBy(h, ids)
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), key.eqNullSafe(F.col("__k")))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__k", "__quota")
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
    Docs with NULL id/shard are excluded (not packable deterministically);
    NULL text packs as a zero-token doc (counted in ``n_docs``, adds
    nothing to ``seq_tokens``).
    Parallelism is #shards — pick the shard key accordingly (e.g.
    ``source``, a date bucket, or ``pmod(hash(id), N)`` upstream)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    ids = F.col("`%s`" % id_col)
    sh = F.col("`%s`" % shard_col)
    # NULL text/count = ZERO tokens: under ANSI-off Spark size(NULL) is
    # -1, which would shift every later doc's prefix sum in the shard
    ntok = F.coalesce(
        (
            F.col("`%s`" % count_col)
            if count_col
            else token_count(F.col("`%s`" % text_col))
        ).cast("long"),
        F.lit(0),
    )
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


def select_until_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    count_col: str,
    id_col: str = "doc_id",
    num_ranges: int = 64,
) -> DataFrame:
    """Token-budget corpus selection: keep the best-scoring docs (score
    desc, id-asc tiebreak) whose RUNNING token total stays within
    *budget* — "take the highest-quality N-token slice of the corpus",
    the selection step between quality scoring and training.  Returns the
    selected rows with an extra ``cum_tokens`` column (the inclusive
    running total at that row).

    The naive plan — ``sum(count) OVER (ORDER BY score DESC)`` — funnels
    the ENTIRE corpus through one task (an unpartitioned window).  This
    is the distributed two-pass prefix sum instead: range-repartition on
    the sort key (*num_ranges* contiguous score slices), per-slice
    running sums via a window PARTITIONED by slice, then one tiny
    ≤ *num_ranges*-row aggregate of slice totals whose exclusive prefix
    sums are broadcast back as per-slice offsets.  Cost: the range
    exchange plus the window's hash exchange on the slice id — both over
    *df*'s rows, so at extreme scale pass a SLIM projection (id, score,
    count) and join payloads back on id afterwards (the selected set is
    budget-bounded).  Range boundaries come from Spark's sampling and may
    vary run-to-run — the selected SET does not, because a global prefix
    sum is identical for every contiguous split of a total order.

    The totals branch and the window branch must see the SAME slice
    boundaries, so the ranged slim triple is ``localCheckpoint``-ed
    (lazy): the range shuffle provably runs once even if exchange reuse
    is disabled or a refactor breaks canonical-plan equality between the
    branches — without it, two independently sampled range shuffles
    could pick different boundaries and silently mis-add offsets.

    ``(score, id)`` must be a total order (unique ids); rows with NULL
    id/score/count are excluded by contract (not orderable/billable)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if num_ranges <= 0:
        raise ValueError("num_ranges must be positive")
    ids = F.col("`%s`" % id_col)
    sc = F.col("`%s`" % score_col)
    n = F.col("`%s`" % count_col).cast("long")
    base = df.filter(ids.isNotNull() & sc.isNotNull() & n.isNotNull())
    ranged = (
        base.repartitionByRange(num_ranges, sc.desc(), ids.asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(sc.desc(), ids.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = ranged.groupBy("__pid").agg(F.sum(n).alias("__t"))
    # exclusive prefix over ≤ num_ranges rows — bounded, never data-sized
    ow = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(ow), F.lit(0)).alias("__off")
    )
    return (
        ranged.withColumn("__run", F.sum(n).over(w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn("cum_tokens", F.col("__off") + F.col("__run"))
        .filter(F.col("cum_tokens") <= budget)
        .drop("__pid", "__run", "__off")
    )


def shuffle_plan(
    df: DataFrame,
    n_shards: int,
    epoch: int = 0,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global-shuffle coordinates for one training epoch:
    per non-NULL id one row ``(<id_col>, shard, pos)`` where ``shard =
    hex8(md5(salt:epoch:id)) mod n_shards`` and ``pos`` ranks the doc
    inside its shard by the same hash.  Reading shards in index order and
    rows in ``pos`` order yields a pseudo-random permutation of the
    corpus that is bit-reproducible across runs, engines, partitionings,
    and cluster sizes — unlike ``df.orderBy(rand())``, whose output
    depends on seed plumbing and partition layout.  Bumping *epoch*
    re-deals everything (the epoch is folded into the hash salt).

    Plan: pure hash exprs + one ``row_number`` window hash-partitioned on
    ``shard`` — a single exchange.  Each shard is ranked inside one task,
    so choose *n_shards* to keep shards task-sized (e.g. corpus_bytes /
    256 MB); md5 spreads ids uniformly, so shards are balanced within
    ~sqrt(n/n_shards) regardless of id skew.  NULL ids are excluded
    (unhashable — same contract as :func:`sample_deterministic`).
    Duplicate ids share a hash and tie-break arbitrarily, but since the
    output carries nothing else, the result multiset is still
    deterministic."""
    if n_shards < 1:
        raise ValueError("n_shards must be positive")
    ids = F.col("`%s`" % id_col)
    h = _bucket_hash(ids, "%s:e%d" % (salt, int(epoch)))
    shard = (F.conv(h, 16, 10).cast("long") % n_shards).cast("int")
    pos = F.row_number().over(
        Window.partitionBy("__shard").orderBy("__h", id_col)
    )
    return (
        df.filter(ids.isNotNull())
        .select(ids.alias(id_col), h.alias("__h"), shard.alias("__shard"))
        .select(
            F.col(id_col),
            F.col("__shard").alias("shard"),
            pos.alias("pos"),
        )
    )


def shuffled_export(
    df: DataFrame,
    path: str,
    n_shards: int,
    epoch: int = 0,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
    rows_per_file: Optional[int] = None,
) -> None:
    """Write *df* as a deterministically shuffled training layout:
    ``path/shard=K/`` directories whose parquet rows are stored in
    :func:`shuffle_plan` order (``pos`` ascending; the column is kept so
    loaders — and tests — can verify the order after any reader-side
    re-split).  One exchange total: the rank window's hash partitioning
    by ``shard`` is exactly the layout ``partitionBy('shard')`` writes,
    and ``sortWithinPartitions`` adds no second shuffle.  With
    *rows_per_file* the writer rolls files every N rows
    (``maxRecordsPerFile``), so file k of a shard holds positions
    ``[k*N, (k+1)*N)`` — seekable by (shard, file, offset).

    Rows whose id is NULL are excluded, matching :func:`shuffle_plan`.
    Duplicate ids get distinct ``pos`` values but WHICH payload row takes
    which pos is arbitrary — ids are assumed unique upstream (enforce
    with the engine's uniqueness check)."""
    ids = F.col("`%s`" % id_col)
    h = _bucket_hash(ids, "%s:e%d" % (salt, int(epoch)))
    shard = (F.conv(h, 16, 10).cast("long") % int(n_shards)).cast("int")
    pos = F.row_number().over(Window.partitionBy("shard").orderBy("__h", id_col))
    out = (
        df.filter(ids.isNotNull())
        .withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", pos)
        .drop("__h")
        # shard first: the dynamic-partition writer needs its input sorted
        # on the partition column or it inserts its OWN sort, which would
        # not be obliged to keep pos order
        .sortWithinPartitions("shard", "pos")
    )
    w = out.write.mode("overwrite").partitionBy("shard")
    if rows_per_file:
        w = w.option("maxRecordsPerFile", int(rows_per_file))
    w.parquet(path)


def split_by_cluster(
    df: DataFrame,
    clusters: DataFrame,
    holdout_fraction: float = 0.125,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Leakage-free train/holdout assignment: every doc in the same
    duplicate cluster lands in the SAME split, so near-duplicates of
    training docs can never contaminate the holdout set.  *clusters* is
    ``(id, cluster_id)`` as produced by
    :func:`~evalidate_spark.functions.dedup.duplicate_clusters`; docs
    absent from it are singletons (their own cluster).  Returns *df*'s
    rows (NULL ids excluded — unhashable) with ``cluster`` and ``split``
    (``'holdout'`` / ``'train'``) columns added.

    The split is hash-derived (md5 hex-prefix threshold, the
    :func:`sample_deterministic` scheme), keyed on the cluster's CANONICAL
    id — reproducible across runs/engines and stable under re-clustering
    as long as the component minimum is unchanged.  Plan: one id-keyed
    equi-join (the clusters side only holds docs that HAVE duplicates, so
    AQE usually broadcasts it) + pure hash exprs.

    This is exactly ``split_multiway(df, clusters, {"holdout": f})`` —
    one shared implementation, so the NULL-id filter, cluster-map join,
    and hash-interval scheme cannot drift between the two forms."""
    if not (0.0 <= holdout_fraction <= 1.0):
        raise ValueError("holdout_fraction must be in [0, 1]")
    return split_multiway(
        df,
        clusters,
        {"holdout": holdout_fraction},
        rest="train",
        id_col=id_col,
        salt=salt,
    )


def split_multiway(
    df: DataFrame,
    clusters: DataFrame,
    fractions: dict,
    rest: str = "train",
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """K-way generalization of :func:`split_by_cluster`: *fractions* maps
    split names to hash-space shares (e.g. ``{"test": 0.1, "val": 0.1}``)
    and every remaining cluster lands in *rest* — so a train/val/test
    carve-out stays leakage-free (whole duplicate clusters move
    together) and deterministic.  Splits occupy contiguous,
    insertion-ordered hash intervals, so the nesting guarantee is
    POSITIONAL: for a fixed *salt*, growing the LAST-listed split's
    fraction only moves clusters into it from *rest*; growing an earlier
    split shifts every later split's interval and reassigns clusters at
    those boundaries.  To keep a frozen holdout stable while other
    splits grow, list the frozen split FIRST (its interval start is 0,
    so it never moves) and grow only the last one — or carve the frozen
    split out under a dedicated salt via :func:`split_by_cluster`.

    Same plan as the two-way form: one id-keyed equi-join against the
    (duplicates-only) cluster map + pure hash exprs, no extra shuffle."""
    if rest in fractions:
        raise ValueError("rest split %r must not appear in fractions" % rest)
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be >= 0")
    if sum(fractions.values()) > 1.0 + 1e-12:
        raise ValueError("fractions must sum to <= 1")
    ids = F.col("`%s`" % id_col)
    lab = clusters.select(
        F.col("id").alias("__lab_id"), F.col("cluster_id").alias("__lab_cluster")
    )
    j = df.filter(ids.isNotNull()).join(lab, ids == F.col("__lab_id"), "left")
    cluster = F.coalesce(F.col("__lab_cluster"), ids)
    h = _bucket_hash(cluster, salt)
    split = None
    lo = 0.0
    for name, frac in fractions.items():
        lo += frac
        b = int(lo * (1 << 32))
        bound = F.lit("g" if b >= (1 << 32) else "%08x" % b)
        cond = h < bound
        split = F.when(cond, F.lit(str(name))) if split is None else split.when(
            cond, F.lit(str(name))
        )
    split = F.lit(rest) if split is None else split.otherwise(F.lit(rest))
    return (
        j.withColumn("cluster", cluster)
        .withColumn("split", split)
        .drop("__lab_id", "__lab_cluster")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    by=None,
    id_col: str = "doc_id",
    salt: str = "ws-v1",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement — *k* rows whose
    inclusion odds are proportional to *weight_col* (quality scores,
    domain priors, token counts), the selection step of a weighted
    training-data mixture.

    Algorithm: Efraimidis & Spirakis (IPL 2006) A-ES priority sampling —
    each row gets the key ``ln(u)/w`` with ``u`` uniform in (0,1), and
    the k LARGEST keys are the sample, which is distribution-identical
    to sequential weighted draws without replacement.  As everywhere in
    this module, ``u`` is HASH-derived, not RNG-derived: the first 13
    hex chars of ``md5(salt || id)`` read as a 52-bit integer (exact in
    a double), so the sample is reproducible across runs, engines, and
    cluster sizes, and any SQL engine with ``md5()`` replays it row for
    row.

    With ``by='col'`` (or a list of columns) the top-k is per stratum
    (e.g. "300 docs per language, quality-weighted").

    Rows with NULL id, NULL weight, or weight <= 0 are never sampled
    (``ln(u)/w`` is undefined or order-inverted there; zero-weight rows
    have zero inclusion odds by definition).

    Plan: global form — one pure projection + ``orderBy().limit(k)``,
    which Spark executes as TakeOrdered (per-partition top-k, tree
    reduce): no full sort, no data shuffle, k rows move.  Stratified
    form — one shuffle on the stratum key with a streaming row_number,
    the :func:`sample_stratified` shape."""
    if k <= 0:
        raise ValueError("k must be positive")
    ids = F.col("`%s`" % id_col)
    w = F.col("`%s`" % weight_col).cast("double")
    hx = F.substring(F.md5(F.concat(F.lit(salt), ids.cast("string"))), 1, 13)
    u = (F.conv(hx, 16, 10).cast("double") + F.lit(0.5)) / float(1 << 52)
    key = F.log(u) / w
    base = df.filter(ids.isNotNull() & w.isNotNull() & (w > 0))
    if by is None:
        return (
            base.withColumn("__wkey", key)
            .orderBy(F.col("__wkey").desc(), ids.asc())
            .limit(k)
            .drop("__wkey")
        )
    # a bare column name is the natural call (matching sample_stratified);
    # iterating its characters would stratify on 1-char pseudo-columns
    by = [by] if isinstance(by, str) else list(by)
    by_cols = [F.col("`%s`" % c) for c in by]
    win = Window.partitionBy(*by_cols).orderBy(key.desc(), ids.asc())
    return (
        base.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
