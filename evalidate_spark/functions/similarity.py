"""Similarity search over embedding columns (``array<float>``).

Three tiers, increasing scale:

* :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  probe set, one scan of the corpus, per-query top-k via window rank.
  Baseline and oracle for the approximate paths.  O(|corpus|·|probes|·d)
  but zero shuffle of the corpus (probes are broadcast; the only shuffle
  is the per-query top-k of |corpus| candidate rows — pre-filtered by a
  per-partition partial top-k so the shuffle carries ≤ k·partitions rows
  per query).
* :func:`lsh_bucket_pairs` — random-hyperplane LSH all-pairs: sign-bit
  bucket then exact cosine inside buckets only.
* :func:`ivf_topk` — IVF (inverted file) ANN: k-means centroids fitted on
  a driver-side sample (numpy, deterministic seed), corpus assigned to its
  nearest centroid once (cheap: |corpus|·C dot products, no shuffle),
  queries probe only the ``nprobe`` nearest cells — the classic
  recall/throughput dial for 10^12-scale corpora.

Dot products use ``F.aggregate``/``F.zip_with`` (JVM-side, codegen) — no
Python in any hot path.
"""

from __future__ import annotations


from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbours for every probe:
    ``(query_id, neighbor_id, cosine, rank)``, rank 1..k, ties broken by
    neighbor id (deterministic).

    Probes are broadcast (they must be small — a probe *set*, not a second
    corpus); the corpus is scanned once.  A per-partition partial top-k
    (repartition-free window over ``spark_partition_id``) cuts the final
    per-query shuffle to ≤ k rows per (query, partition).
    """
    c = corpus.select(
        F.col("`%s`" % id_col).alias("neighbor_id"), F.col("`%s`" % vec_col).alias("__cv")
    )
    p = probes.select(
        F.col("`%s`" % probe_id_col).alias("query_id"), F.col("`%s`" % vec_col).alias("__pv")
    )
    scored = c.join(F.broadcast(p)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__cv"), F.col("__pv")), 6).alias("cosine"),
        F.spark_partition_id().alias("__part"),
    )
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    partial = Window.partitionBy("query_id", "__part").orderBy(*order)
    pruned = scored.withColumn("__pr", F.row_number().over(partial)).filter(F.col("__pr") <= k)
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 16,
    seed: int = 42,
    max_bucket: int = 256,
) -> DataFrame:
    """All-pairs candidate generation via random-hyperplane LSH: bucket =
    sign bits of *planes* fixed random projections (deterministic seed),
    exact cosine computed inside buckets only → ``(id_a, id_b, cosine)``.

    The hyperplanes are literal arrays compiled into the plan (planes×d
    doubles — tiny); bucketing is one shuffle on the bucket key."""
    import numpy as np

    first = df.select(F.size(F.col("`%s`" % vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = first["d"]
    rng = np.random.default_rng(seed)
    planes_m = rng.standard_normal((planes, dim))

    vec = F.col("__v")
    bits = [
        (dot(vec, F.array(*[F.lit(float(x)) for x in row])) >= 0).cast("int").alias(f"b{i}")
        for i, row in enumerate(planes_m)
    ]
    sigs = df.select(
        F.col("`%s`" % id_col).alias("__id"), F.col("`%s`" % vec_col).alias("__v")
    ).select(
        "__id",
        "__v",
        F.concat_ws("", *[b.cast("string") for b in bits]).alias("__bucket"),
    )
    buckets = (
        sigs.groupBy("__bucket")
        .agg(F.sort_array(F.collect_list(F.struct("__id", "__v"))).alias("xs"))
        .filter(F.size("xs") > 1)
        .select(F.slice("xs", 1, max_bucket).alias("xs"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("xs"),
                    lambda a, i: F.transform(
                        F.slice(F.col("xs"), i + 2, F.size(F.col("xs"))),
                        lambda b: F.struct(
                            a["__id"].alias("id_a"),
                            b["__id"].alias("id_b"),
                            F.round(cosine(a["__v"], b["__v"]), 6).alias("cosine"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b", "p.cosine").dropDuplicates(["id_a", "id_b"])


def _kmeans_centroids(
    df: DataFrame, vec_col: str, n_centroids: int, sample_n: int, iters: int, seed: int
) -> List[List[float]]:
    """Fit centroids on a driver-side sample with numpy (deterministic).
    The sample is tiny (default 10k vectors); the corpus itself is never
    collected."""
    import numpy as np

    rows = (
        df.select(F.col("`%s`" % vec_col).alias("v"))
        .limit(sample_n)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    n = len(x)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(n, size=min(n_centroids, n), replace=False)]
    for _ in range(iters):
        # cosine assignment on normalised vectors
        xn = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)
        assign = np.argmax(xn @ cn.T, axis=1)
        for c in range(len(cents)):
            m = x[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def ivf_assign(
    df: DataFrame, centroids: List[List[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Append ``cell`` = argmax-cosine centroid index (one fused projection;
    centroids are plan literals)."""
    vec = F.col("`%s`" % vec_col)
    scored = F.array(
        *[
            F.struct(
                F.round(cosine(vec, F.array(*[F.lit(v) for v in c])), 9).alias("s"),
                F.lit(-i).alias("nix"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(scored)
    return df.withColumn("cell", (-best["nix"]).cast("int"))


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "query_id",
    sample_n: int = 10_000,
    iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus pre-assigned to centroid cells; each
    probe scans only its *nprobe* nearest cells.  Returns
    ``(query_id, neighbor_id, cosine, rank)``.

    At production scale the assigned corpus is written partitioned by
    ``cell`` so a probe touches nprobe/n_centroids of the data (partition
    pruning); here the cell filter happens in the join condition."""
    centroids = _kmeans_centroids(corpus, vec_col, n_centroids, sample_n, iters, seed)
    assigned = ivf_assign(corpus, centroids, vec_col).select(
        F.col("`%s`" % id_col).alias("neighbor_id"),
        F.col("`%s`" % vec_col).alias("__cv"),
        "cell",
    )
    probe_cells = ivf_probe_cells(probes, centroids, nprobe, vec_col, probe_id_col)
    scored = assigned.join(
        F.broadcast(probe_cells), F.array_contains(probe_cells["cells"], assigned["cell"])
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__cv"), F.col("__pv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_probe_cells(
    probes: DataFrame,
    centroids: List[List[float]],
    nprobe: int,
    vec_col: str = "embedding",
    probe_id_col: str = "query_id",
) -> DataFrame:
    """Per-probe ``cells`` array: indices of the *nprobe* nearest centroids."""
    vec = F.col("`%s`" % vec_col)
    scored = F.array(
        *[
            F.struct(
                F.round(cosine(vec, F.array(*[F.lit(v) for v in c])), 9).alias("s"),
                F.lit(i).alias("ix"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return probes.select(
        F.col("`%s`" % probe_id_col).alias("query_id"),
        F.col("`%s`" % vec_col).alias("__pv"),
        F.transform(top, lambda s: s["ix"]).alias("cells"),
    )
