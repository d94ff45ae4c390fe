"""Deterministic synthetic fixtures (FIXTURES.md schemas).

The interleaved text+media ``documents`` table (input_hint shape) and its
``media_catalog`` dimension are generated **distributed**: ``spark.range`` +
pure Column expressions seeded through ``xxhash64`` — no driver-side data, no
Python row loop, reproducible bit-for-bit at any parallelism, and linear in
cluster size (this is also the bench input generator, so it must scale the
same way the engine does).

Violation injection rates follow FIXTURES.md §1: ~1% null doc_id, ~0.5%
duplicate doc_id (with hot keys for skew), ~1% dangling media_ref, ~1%
kind/text/media_ref inconsistency, ~1% offset inversions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEED = 42


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols, F.lit(SEED))


def _pct(hash_col, pct_times_10: int) -> F.Column:
    """True for ~pct_times_10/1000 of rows, deterministically."""
    return F.pmod(hash_col, F.lit(1000)) < pct_times_10


def gen_documents(
    spark: SparkSession,
    n_docs: int,
    n_media: int = 10_000,
    max_spans: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Interleaved text+media documents:
    ``doc_id string, spans array<struct<kind,text,media_ref,offset int>>``."""
    base = spark.range(0, n_docs, numPartitions=partitions)
    i = F.col("id")
    h = _h(i)

    # doc_id: ~1% null, ~0.5% duplicates (mapped onto 3 hot keys for skew)
    doc_id = (
        F.when(_pct(_h(i, F.lit(1)), 10), F.lit(None))
        .when(
            _pct(_h(i, F.lit(2)), 5),
            F.concat(F.lit("hot-"), F.pmod(_h(i, F.lit(3)), F.lit(3)).cast("string")),
        )
        .otherwise(F.concat(F.lit("doc-"), i.cast("string")))
    )

    n_spans = (F.pmod(h, F.lit(max_spans)) + 1).cast("int")

    def span(j: F.Column) -> F.Column:
        hj = _h(i, j)
        is_text = F.pmod(hj, F.lit(2)) == 0
        # ~1% kind/text/media_ref inconsistency: text span carrying media_ref
        inconsistent = _pct(_h(i, j, F.lit(4)), 10)
        # ~1% dangling refs: index beyond the catalog
        ref_ix = F.when(
            _pct(_h(i, j, F.lit(5)), 10),
            F.pmod(_h(i, j, F.lit(6)), F.lit(n_media)) + n_media,
        ).otherwise(F.pmod(_h(i, j, F.lit(6)), F.lit(n_media)))
        media_ref = F.concat(F.lit("m-"), ref_ix.cast("string"))
        text = F.concat(
            F.lit("token"),
            F.pmod(hj, F.lit(997)).cast("string"),
            F.lit(" word"),
            F.pmod(_h(i, j, F.lit(7)), F.lit(503)).cast("string"),
        )
        # offsets grow ~j*7; ~1% inverted (negative step)
        offset = F.when(
            _pct(_h(i, j, F.lit(8)), 10), (j * 7 - 11).cast("int")
        ).otherwise((j * 7).cast("int"))
        return F.struct(
            F.when(is_text, F.lit("text")).otherwise(F.lit("media")).alias("kind"),
            F.when(is_text | inconsistent, text).alias("text"),
            F.when(~is_text | inconsistent, media_ref).alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return base.select(doc_id.alias("doc_id"), spans.alias("spans"))


def gen_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    partitions: int | None = None,
    twin_every: int = 25,
) -> DataFrame:
    """Deterministic synthetic embedding corpus for scaling benches:
    ``vec_id long, embedding array<float>, label int`` — weakly
    clusterable spike-plus-noise vectors (spike 0.2 at dim
    ``vec_id % 4``, hash-noise in [-0.2, 0.2]) generated entirely
    JVM-side (one fused projection, no Python, no collect — the
    generator itself scales with the job it feeds).  The spike is
    NOISE-SCALE on purpose: a dominant spike would collapse every
    same-label vector onto one SRP sign pattern and the LSH bucket
    distribution would be 4 mega-buckets instead of the high-entropy
    spread real embeddings have.  Every *twin_every*-th vector is
    followed by a 1.01-scaled twin at ``vec_id + n_vecs`` (scaling
    preserves SRP sign bits), so LSH candidate generation has real
    positives at every scale."""
    base = spark.range(0, n_vecs, numPartitions=partitions)
    i = F.col("id")

    def vec(scale: float) -> F.Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (
                    F.when(j == F.pmod(i, F.lit(4)).cast("int"), F.lit(0.2))
                    .otherwise(F.lit(0.0))
                    + (F.pmod(_h(i, j), F.lit(4001)) - 2000) / 10000.0
                )
                * scale
            ).cast("float"),
        )

    orig = base.select(
        i.alias("vec_id"),
        vec(1.0).alias("embedding"),
        F.pmod(i, F.lit(4)).cast("int").alias("label"),
    )
    twins = base.filter(F.pmod(i, F.lit(twin_every)) == 0).select(
        (i + n_vecs).alias("vec_id"),
        vec(1.01).alias("embedding"),
        F.pmod(i, F.lit(4)).cast("int").alias("label"),
    )
    return orig.unionByName(twins)


def gen_media_catalog(spark: SparkSession, n_media: int = 10_000) -> DataFrame:
    """media_catalog(media_ref PK, media_kind, size_bytes) — FIXTURES.md §2."""
    i = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(_h(i), F.lit(3)) + 1).cast("int"),
    )
    return spark.range(0, n_media).select(
        F.concat(F.lit("m-"), i.cast("string")).alias("media_ref"),
        kind.alias("media_kind"),
        (F.pmod(_h(i, F.lit(9)), F.lit(10_000_000)) + 100).alias("size_bytes"),
    )


def gen_events_baseline(spark: SparkSession, n: int = 10_000) -> DataFrame:
    """Synthetic numeric distribution for drift tests (stable baseline)."""
    i = F.col("id")
    return spark.range(0, n).select(
        (F.pmod(_h(i), F.lit(1000)) / 100.0).alias("value")
    )


def gen_events_shifted(spark: SparkSession, n: int = 10_000, shift: float = 3.0) -> DataFrame:
    i = F.col("id")
    return spark.range(0, n).select(
        (F.pmod(_h(i), F.lit(1000)) / 100.0 + shift).alias("value")
    )


# ----------------------------------------------------- hostile corpus
# Adversarial twins of the testdata tables: every NULL/empty/multi-space/
# duplicate/invalid-value shape the shipped parquet never contains.  The
# SINGLE source of truth for tests/test_hostile_parity.py (the pinned
# oracle-parity gate) and scripts/hostile_probe.py (its row-diff aid) —
# keep them in lockstep by construction.

HOSTILE_DOCS = [
    (1, None, "en", "src1", 0),
    (2, None, "en", "src2", 0),
    (3, "", "es", "src3", 0),
    (4, "a  b   c", "en", "src4", 8),
    (5, "x y z x y z", "es", "src5", 11),
    (6, "x y z x y z", "zz", "bad!", 11),   # bad lang + regex-fail source
    (7, "the the the the", None, "src7", None),  # NULL lang + n_chars
    (None, "orphan text row here", "de", "src8", 20),  # NULL doc_id
    (8, "solo", "de", None, 4),             # NULL source
    # encoding damage: U+FFFD, a raw BEL control byte, latin-1 mojibake
    # digraphs (â€™ and Ã©) — drives functions.text.encoding_anomalies
    (9, "café � b\x07ad â€™text Ã©",
     "en", "src9", 22),
    # raw HTML with script/comment bodies and entities — drives
    # functions.text.html_to_text; also exercises <>& flowing through
    # every other text operator
    (10, '<p>Hello &amp; <b>world</b></p><script>var x="z";</script>'
         '<!-- c --><ul><li>a</li></ul>', "en", "src10", 87),
]
HOSTILE_EVENTS = [
    (1, "2026-01-01 10:00:00", 1, "view", 1.5, None),
    (2, "2026-01-01 10:05:00", 1, "view", None, None),  # NULL value
    (3, "2026-01-01 11:00:00", 1, "buy", 2.5, None),
    (4, "2026-01-01 10:00:00", None, "view", 3.0, None),  # NULL user
    (5, None, 2, "view", 4.0, None),  # NULL ts
    (6, "2026-01-01 10:30:00", 2, None, 0.0, None),  # NULL type
    (None, "2026-01-01 12:00:00", 3, "view", -1.0, None),  # NULL id
    # sequence-integrity rows: user 2 repeats event_id 6 (duplicate_seq);
    # user 3's ids 7→8 run BACKWARD in time (ts_regression)
    (6, "2026-01-01 10:31:00", 2, "view", 5.0, None),
    (7, "2026-01-01 09:00:00", 3, "view", 1.0, None),
    (8, "2026-01-01 08:30:00", 3, "view", 1.0, None),
    # funnel rows: user 1 completes signup→view→click→purchase in order;
    # user 4 purchases BEFORE signup (must not count) and has signup+view
    # at the SAME timestamp (ties inclusive → reaches view, stops there)
    (9, "2026-01-01 09:00:00", 1, "signup", 1.0, None),
    (10, "2026-01-01 10:10:00", 1, "click", 1.0, None),
    (11, "2026-01-01 10:20:00", 1, "purchase", 1.0, None),
    (12, "2026-01-01 08:00:00", 4, "purchase", 1.0, None),
    (13, "2026-01-01 09:00:00", 4, "signup", 1.0, None),
    (14, "2026-01-01 09:00:00", 4, "view", 1.0, None),
    # changelog rows: user 5's LATEST event is an 'error' (delete marker →
    # user vanishes from the compacted state); user 6 has a same-ts tie
    # resolved by event_id desc
    (15, "2026-01-01 09:00:00", 5, "view", 1.0, None),
    (16, "2026-01-01 10:00:00", 5, "error", 1.0, None),
    (17, "2026-01-02 10:00:00", 6, "click", 1.0, None),
    (18, "2026-01-02 10:00:00", 6, "view", 2.0, None),
]
# orders: one row per table_diff branch (%97 removed, %89 repriced,
# %101 re-added, 89·101 changed-with-NULL-price), a NULL key (never pairs
# → removed), a NULL date (promo-excluded), a DUPLICATED key (keyed-diff
# multiplication replays identically in SQL), a %499 promo definition
# with orders on and inside its inclusive 14-day boundary, and keys 1-3
# reconciling against HOSTILE_LINEITEM (exact match / short sum / NULL
# stored total)
HOSTILE_ORDERS = [
    (97, 1, "O", 100.0, "2026-01-01 00:00:00", "1-URGENT"),
    (89, 1, "F", 50.0, "2026-01-02 00:00:00", "2-HIGH"),
    (101, 2, "O", 75.0, "2026-01-03 00:00:00", "3-MEDIUM"),
    (499, 2, "O", 20.0, "2026-01-05 00:00:00", "4-LOW"),
    (8989, 3, "P", None, "2026-01-06 00:00:00", "5-LOW"),
    (None, 1, "O", 10.0, "2026-01-01 00:00:00", "1-URGENT"),
    (200, 4, "O", 30.0, None, "2-HIGH"),
    (300, 5, "O", 60.0, "2026-01-04 00:00:00", "1-URGENT"),
    (300, 5, "F", 61.0, "2026-01-04 00:00:00", "1-URGENT"),
    (601, 6, "O", 45.0, "2026-01-10 00:00:00", "3-MEDIUM"),
    (701, 6, "O", 45.0, "2026-01-19 00:00:00", "3-MEDIUM"),  # == start+14d
    (1, 7, "O", 1005.0, "2026-01-07 00:00:00", "1-URGENT"),
    (2, 7, "O", 100.0, "2026-01-08 00:00:00", "2-HIGH"),
    (3, 7, "O", None, "2026-01-09 00:00:00", "3-MEDIUM"),
]
# trailing pair per row = (l_extendedprice, l_discount): zero / negative /
# below-quantity prices and out-of-range / NULL discounts drive every
# expression-check branch (price_positive, price_vs_qty, discount_range)
HOSTILE_LINEITEM = [
    (1, 1, 2, 10.0, "N", "F", "2026-01-05", 1000.0, 0.05),
    (1, 2, 4, 20.0, "R", "O", "2026-01-06", 5.0, 0.11),  # price < qty; disc > 0.1
    (2, 1, 3, None, "A", "", None, 0.0, -0.01),  # zero price; negative disc
    (2, 2, None, 30.0, None, None, "2026-01-07", None, None),  # NULL price/disc
    (None, 1, 6, 40.0, "N", "F", "2026-01-08", -42.5, 0.0),  # negative price
    (3, None, 99, 50.0, "R", "O", "2026-01-09", 60000.0, 0.1),  # NULL linenumber, dangling
]
HOSTILE_SUPPLIER = [(2, "s2"), (4, "s4"), (6, "s6"), (None, "snull")]
# part: one row per validate_part branch — regexp fail, allowed fail, both
# size bounds, both price bounds, and a NULL per rule (presence=required)
HOSTILE_PART = [
    (1, "n1", "Brand#12", "ECONOMY", 10, 950.0),
    (2, "n2", "brandX", "ECONOMY", 10, 950.0),  # regexp fail
    (3, "n3", "Brand#5", "FANCY", 10, 950.0),  # allowed fail
    (4, "n4", "Brand#5", "SMALL", 3, 950.0),  # size < min
    (5, "n5", "Brand#5", "SMALL", 99, 950.0),  # size > max
    (6, "n6", "Brand#5", "SMALL", 10, 100.0),  # price < min
    (7, "n7", "Brand#5", "SMALL", 10, 2000.0),  # price > max
    (8, "n8", None, "SMALL", 10, 950.0),
    (9, "n9", "Brand#5", None, 10, 950.0),
    (10, "n10", "Brand#5", "SMALL", None, 950.0),
    (11, "n11", "Brand#5", "SMALL", 10, None),
    (None, "n12", "Brand#5", "SMALL", 10, 950.0),
    # fuzzy_matches hostile cluster: shared "fuzz" block, case/whitespace
    # folds, a >max_dist member, NULL/blank names, short-name block, a
    # typo-injection hit (21 % 7 == 0) and a double-space deletion (28)
    (20, "fuzzy Block Alpha one", "Brand#5", "SMALL", 10, 950.0),
    (21, "  fuzzy   block alpha one ", "Brand#5", "SMALL", 10, 950.0),
    (22, "fuzzy block alpha oXe", "Brand#5", "SMALL", 10, 950.0),
    (23, "fuzzy block beta", "Brand#5", "SMALL", 10, 950.0),
    (24, None, "Brand#5", "SMALL", 10, 950.0),
    (25, "    ", "Brand#5", "SMALL", 10, 950.0),
    (26, "fuzz", "Brand#5", "SMALL", 10, 950.0),
    (27, "fuzzy", "Brand#5", "SMALL", 10, 950.0),
    (28, "fuzzy  block  gamma two", "Brand#5", "SMALL", 10, 950.0),
    (29, "fuzzy blöck alpha one", "Brand#5", "SMALL", 10, 950.0),
]
HOSTILE_NATION = [
    (1, "alpha", 1),
    (2, "beta", 1),
    (3, None, 2),  # NULL name → min() skips in both engines
    (4, "gamma", None),  # NULL regionkey never inner-joins
    (None, "delta", 3),  # NULL nationkey (unused by the rollup)
    (5, "eps", 9),  # dangling regionkey
]
HOSTILE_REGION = [
    (1, "r-one"),
    (2, None),  # NULL group key survives GROUP BY on both engines
    (3, "r-three"),
    (None, "r-null"),  # NULL key never joins
    (4, "r-empty"),  # region with no nations
]


def _noise(i: int, j: int) -> float:
    """Deterministic pseudo-noise in [-0.2, 0.2) — pure integer mix, no
    numpy/random import, identical on every platform."""
    x = (i * 2654435761 + j * 40503 + 12345) % 2**32
    x = ((x ^ (x >> 16)) * 2246822519) % 2**32
    return ((x % 4001) - 2000) / 10000.0


def _hostile_embeddings():
    # 40 clusterable vectors: unit direction e_label + noise (labels 0-3)
    rows = [
        (
            i,
            [(1.0 if j == i % 4 else 0.0) + _noise(i, j) for j in range(64)],
            i % 4,
        )
        for i in range(40)
    ]
    dup = list(rows[7][1])
    rows += [
        (100, None, 0),                     # NULL vector: excluded everywhere
        (101, [0.0] * 64, 1),               # zero vector: scores 0.0 by contract
        (107, [0.0] * 64, 1),               # zero-zero pair is 0.0, NOT 1.0
        (102, [0.5, 0.25, -0.5], 2),        # short: centroid prefix only, unrankable
        (103, [0.1] * 65, 3),               # long: first-dim prefix in centroids
        (None, [1.0] + [0.0] * 63, 0),      # NULL id: shapes centroids, never ranked
        (104, [0.0] * 32 + [1.0] + [0.0] * 31, None),  # NULL label
        (105, dup, 3),                      # exact duplicates of id 7 —
        (106, dup, 0),                      #   near-dup recall stays provable
        # non-finite rows (SURVEY §9.5): every embedding operator must
        # EXCLUDE these by the shared finite-vector contract — a NaN/Inf
        # element otherwise diverges across engines (Spark orders NaN
        # greatest / casts NaN·scale to 0L, DuckDB refuses the cast and
        # comparisons on NaN are false), so presence here gate-enforces
        # the exclusion in every oracled embedding query
        (108, [float("nan")] + [0.25] * 63, 0),    # NaN head
        (109, [0.25] * 63 + [float("inf")], 1),    # +Inf tail
        (110, [float("-inf")] + [0.25] * 63, 2),   # -Inf head
    ]
    return rows


HOSTILE_EMBEDDINGS = _hostile_embeddings()


def canon_value(v) -> str:
    """The driver-compare canonical form of one cell (NULL marker, SQL
    booleans, ``%.6g`` floats).  SINGLE source of truth for
    tests/test_hostile_parity.py (hashes these lines) and
    scripts/hostile_probe.py (diffs them) — a probe OK implies a gate
    pass only while both use exactly this function."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "%.6g" % v
    return str(v)


def canon_lines(cols, rows) -> list:
    """Canonicalised row lines in the driver-compare format: cells joined
    by ``|`` in COLUMN-NAME-SORTED order (unsorted rows — sort or
    multiset-compare at the call site)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ["|".join(canon_value(r[i]) for i in order) for r in rows]


def write_hostile_tables(spark: SparkSession, out_dir: str) -> str:
    """Write the hostile documents/events/lineitem/supplier/embeddings tables as
    single-file parquet under *out_dir* (testdata layout) and return it."""
    import os

    spark.createDataFrame(
        HOSTILE_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    spark.createDataFrame(
        HOSTILE_EVENTS,
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    spark.createDataFrame(
        HOSTILE_LINEITEM,
        "l_orderkey long, l_linenumber int, l_suppkey long, l_quantity double, "
        "l_returnflag string, l_linestatus string, l_shipdate_s string, "
        "l_extendedprice double, l_discount double",
    ).selectExpr(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity", "l_returnflag",
        "l_linestatus", "cast(l_shipdate_s as date) l_shipdate",
        "l_extendedprice", "l_discount",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )
    spark.createDataFrame(
        HOSTILE_SUPPLIER, "s_suppkey long, s_name string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "supplier.parquet")
    )
    spark.createDataFrame(
        HOSTILE_ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(o_orderdate_s as timestamp) o_orderdate", "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )
    spark.createDataFrame(
        HOSTILE_EMBEDDINGS, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    spark.createDataFrame(
        HOSTILE_PART,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "part.parquet")
    )
    spark.createDataFrame(
        HOSTILE_NATION, "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "nation.parquet")
    )
    spark.createDataFrame(
        HOSTILE_REGION, "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "region.parquet")
    )
    return out_dir
