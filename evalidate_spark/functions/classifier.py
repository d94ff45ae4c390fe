"""Linear bag-of-words quality classifier — the fastText-shaped model
filter of a training-data pipeline (CCNet's wiki-reference classifier,
LLaMA's quality model) re-expressed as integer-exact Spark plans.

Inference is exactly what fastText does at prediction time: tokenize,
look each token up in a weight table, average, add a bias, threshold.
Weights here are INTEGER MILLI-UNITS (w * 1000 rounded) so every score
is an integer sum / floor-division — bit-replayable by any SQL engine
and independent of float summation order.  Training is out of scope by
design (weights come from wherever the user trains them); what this
module owns is scoring 10^12 documents without leaving the JVM.

Two physical strategies, same semantics:

- ``strategy="map"`` (default for vocabularies that fit a literal,
  ≤ ``MAP_VOCAB_MAX``): the weight table becomes a literal
  ``map<string,long>`` inside ONE ``F.aggregate`` pass — a pure
  per-row projection, zero shuffle, zero Python; at 10^12 docs it
  rides the same scan as the validation fast path.
- ``strategy="join"``: tokens are exploded and broadcast-hash-joined
  against a weight DataFrame, then re-aggregated per doc — one shuffle
  on doc_id, for vocabularies too large to inline in the plan (real
  classifiers carry 10^5-10^6 n-gram weights; a multi-MB map literal
  would bloat every task's deserialized plan).

Both are pinned bit-identical in tests/test_classifier.py.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens

# Above this many entries the literal-map plan stops being free: the map
# is serialized into every task and HOF lookup is a linear scan.
MAP_VOCAB_MAX = 1024


def _weight_map(weights: Dict[str, int]) -> Column:
    pairs = []
    for token, w in weights.items():
        pairs.append(F.lit(token))
        pairs.append(F.lit(int(w)).cast("long"))
    return F.create_map(*pairs)


def classifier_scores(
    df: DataFrame,
    weights: Dict[str, int],
    bias_milli: int = 0,
    threshold_milli: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "auto",
) -> DataFrame:
    """Score every document under a linear bag-of-words model.

    Returns ``(id_col, n_tokens, hits, logit_milli, keep)``:

    - ``n_tokens``  — whitespace token count (0 for NULL/empty text);
    - ``hits``      — tokens found in the weight table (case-folded);
    - ``logit_milli`` — ``bias_milli + floor(sum_w / n_tokens)`` in
      integer milli-units (mean token weight, fastText's normalization;
      ``bias_milli`` alone when the doc has no tokens).  ``floor`` (not
      truncate-toward-zero) so negative sums divide identically in
      Spark and in SQL replays;
    - ``keep``      — ``logit_milli > threshold_milli``.

    Rows with NULL ``id_col`` are dropped (no stable identity); NULL
    text scores as an empty document — same contract as the rest of the
    text surface.  Unknown tokens carry weight 0, exactly fastText's
    OOV behavior without subword hashing.

    ``id_col`` must be unique under ``strategy="join"`` (the re-aggregate
    groups by it); ``strategy="map"`` scores each row independently.
    """
    n = len(weights)
    if strategy == "auto":
        strategy = "map" if n <= MAP_VOCAB_MAX else "join"
    if strategy == "map":
        return _scores_map(df, weights, bias_milli, threshold_milli, text_col, id_col)
    if strategy == "join":
        return _scores_join(df, weights, bias_milli, threshold_milli, text_col, id_col)
    raise ValueError("strategy must be auto|map|join, got %r" % strategy)


def _finish(sum_w: Column, hits: Column, n_tok: Column, bias: int, thr: int):
    logit = F.lit(int(bias)).cast("long") + F.when(
        n_tok > 0, F.floor(sum_w.cast("double") / n_tok)
    ).otherwise(F.lit(0)).cast("long")
    return [
        n_tok.cast("int").alias("n_tokens"),
        hits.cast("long").alias("hits"),
        logit.alias("logit_milli"),
        (logit > F.lit(int(thr))).alias("keep"),
    ]


def _scores_map(
    df: DataFrame,
    weights: Dict[str, int],
    bias_milli: int,
    threshold_milli: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    ids = F.col("`%s`" % id_col)
    wm = _weight_map(weights)

    # ONE map lookup per token: transform tokens → nullable weights first
    # (NULL == not in vocabulary, so a legitimate 0-weight entry still
    # counts as a hit, matching the join strategy's count(__w) exactly),
    # THEN fold the weight array.  Looking up inside the fold lambda would
    # inline the full map literal — and its linear-scan lookup — into both
    # the sum and hits slots (HOF re-inlining pitfall, caught in review).
    ws = F.transform(
        # NULL text → empty array (aggregate over NULL is NULL, which
        # would blank every output column instead of scoring bias-only)
        F.coalesce(
            tokens(F.col("`%s`" % text_col)), F.array().cast("array<string>")
        ),
        lambda t: F.element_at(wm, F.lower(t)),
    )
    acc = F.aggregate(
        ws,
        F.struct(
            F.lit(0).cast("long").alias("s"),
            F.lit(0).cast("long").alias("h"),
            F.lit(0).cast("long").alias("n"),
        ),
        lambda a, w: F.struct(
            (a["s"] + F.coalesce(w, F.lit(0).cast("long"))).alias("s"),
            (a["h"] + F.when(w.isNotNull(), 1).otherwise(0)).alias("h"),
            (a["n"] + 1).alias("n"),
        ),
    )
    # let-bind the fold result (one evaluation) before fanning out to
    # four output columns
    out = df.filter(ids.isNotNull()).select(
        ids.alias(id_col), acc.alias("__a")
    )
    a = F.col("__a")
    return out.select(
        id_col,
        *_finish(a["s"], a["h"], a["n"], bias_milli, threshold_milli),
    )


def _scores_join(
    df: DataFrame,
    weights: Dict[str, int],
    bias_milli: int,
    threshold_milli: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    ids = F.col("`%s`" % id_col)
    spark = df.sparkSession
    w_df = spark.createDataFrame(
        [(t, int(w)) for t, w in weights.items()], "__tok string, __w long"
    )
    base = df.filter(ids.isNotNull()).select(
        ids.alias(id_col), tokens(F.col("`%s`" % text_col)).alias("__tk")
    )
    # explode_outer keeps zero-token docs (NULL __tok row) so every doc
    # gets a score; broadcast the weight table — it is dwarfed by the
    # corpus at any realistic vocabulary size
    ex = base.select(id_col, F.explode_outer("__tk").alias("__tok0"))
    joined = ex.join(
        F.broadcast(w_df), F.lower(F.col("__tok0")) == F.col("__tok"), "left"
    )
    agg = joined.groupBy(id_col).agg(
        F.sum(F.coalesce(F.col("__w"), F.lit(0))).alias("__s"),
        F.count("__w").alias("__h"),
        F.count("__tok0").alias("__n"),
    )
    return agg.select(
        id_col,
        *_finish(F.col("__s"), F.col("__h"), F.col("__n"), bias_milli, threshold_milli),
    )


def ranking_auc(
    df: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """ROC AUC of an integer score ranking a boolean label — "does the
    quality classifier actually separate the docs the rule filter keeps
    from the ones it drops?" — via the tie-corrected Mann-Whitney
    rank-sum identity, computed from SCORE-GROUP counts:

        AUC = [ sum_s  pos(s) * (neg_below(s) + neg(s)/2) ] / (P * N)

    Physical shape: ONE groupBy on the score (map-side combined — a hot
    score costs one partial row per partition), then a cumulative window
    over the *distinct-score table only*.  That table is bounded by the
    score's cardinality (milli-logits here: thousands of values, not
    rows), so the partitionless ordered window never sees data — the
    10^12-row problem is reduced by the aggregate before any sort.  No
    per-row global rank (a partitionless row-level window would funnel
    the whole table through one task — the anti-pattern this shape
    exists to avoid).

    Everything is integer: the numerator is doubled
    (``2*neg_below + neg``) so ties need no halves, and
    ``auc_bp = (10000 * num2) div (2 * P * N)`` is a truncated integer
    division replayable in any SQL engine.  NULL scores and NULL labels
    are excluded (a doc with no score has no rank; a doc with no label
    has no truth).  ``auc_bp`` is NULL when either class is empty.

    Output (one row): ``n, n_pos, n_neg, n_scores, auc_bp``.
    """
    s = F.col("`%s`" % score_col)
    lab = F.col("`%s`" % label_col)
    grouped = (
        df.filter(s.isNotNull() & lab.isNotNull())
        .groupBy(s.alias("__s"))
        .agg(
            F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("__pos"),
            F.sum(F.when(lab, 0).otherwise(1)).cast("long").alias("__neg"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    terms = grouped.select(
        "__pos",
        "__neg",
        (
            F.col("__pos")
            * (2 * F.coalesce(F.sum("__neg").over(w), F.lit(0)) + F.col("__neg"))
        ).alias("__t2"),
    )
    totals = terms.agg(
        F.sum(F.col("__pos") + F.col("__neg")).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        F.sum("__t2").cast("long").alias("__num2"),
    )
    return totals.select(
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("n_pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).alias("n_neg"),
        "n_scores",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("(10000 * __num2) div (2 * n_pos * n_neg)"),
        )
        .cast("long")
        .alias("auc_bp"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for an integer classifier score vs a boolean
    outcome — the calibration twin of :func:`ranking_auc` (AUC asks
    "does the score RANK docs correctly?", this asks "does a higher
    score bucket actually CONTAIN more positives?").

    Scores are bucketed into *n_bins* equal-width integer bins over the
    observed ``[min, max]``: ``bin = ((s - lo) * n_bins) div (hi - lo + 1)``
    — pure integer arithmetic, engine-stable, no quantile sketch (an
    approximate-quantile binning would make bin membership
    engine-dependent).  Output: one row per non-empty bin —
    ``(bin_ix, bin_lo, bin_hi, n, n_pos, pos_rate_bp)`` with
    ``pos_rate_bp = 10000·n_pos div n`` (truncated integer division;
    monotone pos_rate_bp across bins = calibrated).  NULL scores /
    labels are
    excluded; a constant score degenerates to one bin spanning the
    point.

    Plan: the :func:`ranking_auc` shape — ONE map-side-combined groupBy
    on the SCORE is the only data-cardinality shuffle; the bounds
    aggregate and the bin rollup then run over the distinct-score table
    (score cardinality, not rows).  Putting the aggregate FIRST also
    makes the inevitable two reads of the input (bounds + binning) meet
    at a shuffle Exchange that Spark's ReuseExchange dedups — an
    expensive derived input (a scored+joined pipeline) is computed
    once, not twice.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col("`%s`" % score_col)
    lab = F.col("`%s`" % label_col)
    grouped = (
        df.filter(s.isNotNull() & lab.isNotNull())
        .groupBy(s.cast("long").alias("__s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("__pos"),
        )
    )
    bounds = grouped.agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi")
    )
    binned = grouped.join(F.broadcast(bounds)).select(
        F.expr("((__s - __lo) * %d) div (__hi - __lo + 1)" % n_bins).alias(
            "bin_ix"
        ),
        "__cnt",
        "__pos",
        "__lo",
        "__hi",
    )
    return (
        binned.groupBy("bin_ix")
        .agg(
            # inverse of the membership rule: bin b holds offsets in
            # [ceil(b·w/n), ceil((b+1)·w/n) - 1] — ceil, not floor, or a
            # width < n_bins range mislabels its (single-point) bins
            F.expr(
                "min(__lo + (bin_ix * (__hi - __lo + 1) + %d) div %d)"
                % (n_bins - 1, n_bins)
            )
            .cast("long")
            .alias("bin_lo"),
            F.expr(
                "min(__lo + ((bin_ix + 1) * (__hi - __lo + 1) + %d) div %d - 1)"
                % (n_bins - 1, n_bins)
            )
            .cast("long")
            .alias("bin_hi"),
            F.sum("__cnt").cast("long").alias("n"),
            F.sum("__pos").cast("long").alias("n_pos"),
        )
        .select(
            "bin_ix",
            "bin_lo",
            "bin_hi",
            "n",
            "n_pos",
            F.expr("(10000 * n_pos) div n").cast("long").alias("pos_rate_bp"),
        )
    )


def class_balance(
    df: DataFrame,
    label_col: str = "label",
    weight_scale: int = 10000,
) -> DataFrame:
    """Label-distribution balance report for a training corpus — per
    label: exact count, integer-bp share, and the standard
    inverse-frequency class weight ``total / (k · n_label)`` emitted as
    an EXACT scaled integer (``weight_scaled = (total · weight_scale)
    div (k · n)``; divide by *weight_scale* downstream) — no float
    aggregation, deterministic.  A 99:1 skew silently turns a
    classifier into a majority-vote; this is the check (and the fix's
    input) to run before training a quality/toxicity/language filter.

    NULL labels get their own row (``label`` NULL, weight NULL): an
    unlabeled slice is a labelling-pipeline defect to surface, not
    silently droppable — but it does NOT count toward k or the weight
    denominator of real classes.

    One map-side-combined groupBy over label cardinality + a broadcast
    1-row total; output is label-cardinality rows."""
    lbl = F.col("`%s`" % label_col)
    counts = df.groupBy(lbl.alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = counts.agg(
        F.coalesce(
            F.sum(F.when(F.col("label").isNotNull(), F.col("n_rows"))),
            F.lit(0),
        ).alias("__labeled"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("__total"),
        F.count(F.when(F.col("label").isNotNull(), F.lit(1))).alias("__k"),
    )
    return counts.join(F.broadcast(tot)).select(
        "label",
        "n_rows",
        F.expr("(n_rows * 10000) DIV greatest(__total, 1)")
        .cast("long")
        .alias("share_bp"),
        F.when(
            F.col("label").isNotNull() & (F.col("__k") > 0),
            F.expr(
                "(__labeled * %d) DIV (__k * n_rows)" % int(weight_scale)
            ),
        )
        .cast("long")
        .alias("weight_scaled"),
    )


def pr_curve(
    df: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """Full precision/recall curve of an integer score against a boolean
    label — one row per distinct score, treating each as the "predict
    positive at score >= threshold" cut: ``(threshold, tp, fp, fn, tn,
    precision_bp, recall_bp)``.

    The operating-point companion to :func:`ranking_auc` (AUC says the
    ordering is good; the curve says WHERE to cut it), built on the same
    scale shape: one map-side-combined groupBy on the score, then
    cumulative sums over the *distinct-score table only* — the ordered
    partitionless window never sees row-level data, so the 10^12-row
    input is reduced before any sort.  Class totals ride in via one
    broadcast row.  All arithmetic is exact int64 (``·10000 DIV``);
    NULL scores/labels are excluded as in ``ranking_auc``."""
    s = F.col("`%s`" % score_col)
    lab = F.col("`%s`" % label_col)
    grouped = (
        df.filter(s.isNotNull() & lab.isNotNull())
        .groupBy(s.alias("__s"))
        .agg(
            F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("__pos"),
            F.sum(F.when(lab, 0).otherwise(1)).cast("long").alias("__neg"),
        )
        # pin the distinct-score table: the cumulative window AND the
        # class totals both read it, and without the checkpoint each
        # branch re-runs the upstream scoring pipeline
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grouped.select(
        "__s",
        F.sum("__pos").over(w).cast("long").alias("__cp"),
        F.sum(F.col("__pos") + F.col("__neg")).over(w).cast("long").alias("__cn"),
    )
    totals = grouped.agg(
        F.coalesce(F.sum("__pos"), F.lit(0)).cast("long").alias("__P"),
        F.coalesce(F.sum(F.col("__pos") + F.col("__neg")), F.lit(0))
        .cast("long")
        .alias("__N"),
    )
    return cum.crossJoin(F.broadcast(totals)).select(
        F.col("__s").alias("threshold"),
        F.col("__cp").alias("tp"),
        (F.col("__cn") - F.col("__cp")).cast("long").alias("fp"),
        (F.col("__P") - F.col("__cp")).cast("long").alias("fn"),
        (F.col("__N") - F.col("__cn") - (F.col("__P") - F.col("__cp")))
        .cast("long")
        .alias("tn"),
        F.expr("__cp * 10000L DIV greatest(__cn, 1)")
        .cast("long")
        .alias("precision_bp"),
        F.expr("__cp * 10000L DIV greatest(__P, 1)")
        .cast("long")
        .alias("recall_bp"),
    )
