"""Deterministic sampling + sequence packing: reproducibility, nesting,
quota exactness, DuckDB replay parity, plan shape."""

import duckdb
import pytest

from pyspark.sql import functions as F

from evalidate_spark.functions import sampling

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sample_deterministic_stable_and_nested(spark):
    docs = _docs(spark)
    s10 = {r["doc_id"] for r in sampling.sample_deterministic(docs, 0.10).select("doc_id").collect()}
    again = {r["doc_id"] for r in sampling.sample_deterministic(docs, 0.10).select("doc_id").collect()}
    assert s10 == again and len(s10) > 0
    # repartitioning must not change membership (hash-, not layout-, defined)
    rep = {
        r["doc_id"]
        for r in sampling.sample_deterministic(docs.repartition(13), 0.10).select("doc_id").collect()
    }
    assert rep == s10
    # nesting: the 2% sample is a subset of the 10% sample (same salt)
    s2 = {r["doc_id"] for r in sampling.sample_deterministic(docs, 0.02).select("doc_id").collect()}
    assert s2 < s10
    # a different salt draws a different sample
    other = {
        r["doc_id"]
        for r in sampling.sample_deterministic(docs, 0.10, salt="v2").select("doc_id").collect()
    }
    assert other != s10
    # roughly the right size (md5 uniformity; 500 docs → loose bounds)
    assert 20 <= len(s10) <= 90
    # boundary fractions
    assert sampling.sample_deterministic(docs, 0.0).count() == 0
    assert sampling.sample_deterministic(docs, 1.0).count() == docs.count()


def test_sample_deterministic_matches_duckdb(spark):
    got = sorted(
        r["doc_id"]
        for r in sampling.sample_deterministic(_docs(spark), 0.25, salt="s").select("doc_id").collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""SELECT doc_id FROM '{SF}/documents.parquet'
                WHERE doc_id IS NOT NULL
                  AND substr(md5('s' || cast(doc_id AS varchar)), 1, 8) < '40000000'"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_sample_pushes_into_scan(spark):
    """The stateless sample is a filter in the scan stage: no exchange."""
    plan = (
        sampling.sample_deterministic(_docs(spark), 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_sample_stratified_quota(spark):
    docs = _docs(spark)
    out = sampling.sample_stratified(docs, "lang", quota=20)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.filter(F.col("doc_id").isNotNull()).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {k: min(20, v) for k, v in full.items()}
    # deterministic
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in sampling.sample_stratified(docs, "lang", quota=20).select("doc_id").collect())
    assert a == b


def test_sample_stratified_rejects_bad_quota(spark):
    with pytest.raises(ValueError):
        sampling.sample_stratified(_docs(spark), "lang", quota=0)


def test_pack_sequences_semantics(spark):
    # shard 'a': token counts 3,4,5 in id order, budget 6:
    #   starts at 0,3,7 → seq 0,0,1
    df = spark.createDataFrame(
        [(1, "a", "t1 t2 t3"), (2, "a", "t1 t2 t3 t4"), (3, "a", "t1 t2 t3 t4 t5"),
         (4, "b", "x"), (None, "a", "dropped"), (5, None, "dropped")],
        "doc_id long, shard string, text string",
    )
    got = {
        (r["shard"], r["seq_ix"]): (r["n_docs"], r["seq_tokens"])
        for r in sampling.pack_sequences(df, budget=6, shard_col="shard").collect()
    }
    assert got == {("a", 0): (2, 7), ("a", 1): (1, 5), ("b", 0): (1, 1)}


def test_pack_sequences_matches_duckdb_and_plan(spark):
    docs = _docs(spark)
    out = sampling.pack_sequences(docs, budget=512, shard_col="lang")
    got = sorted(map(tuple, out.collect()))
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                f"""WITH d AS (
                  SELECT lang AS shard, doc_id,
                         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n
                  FROM '{SF}/documents.parquet'
                  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
                ), s AS (
                  SELECT shard,
                         cast(floor(coalesce(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS bigint) AS seq_ix,
                         n
                  FROM d
                )
                SELECT shard, seq_ix, cast(count(*) AS bigint) AS n_docs,
                       cast(sum(n) AS bigint) AS seq_tokens
                FROM s GROUP BY 1, 2"""
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 5
    # window + roll-up share the shard partitioning: ONE exchange
    # (AQE's toString appends an "Initial Plan" duplicate — count the final)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_select_until_budget_semantics(spark):
    # scores force order 4,2,3,1 (desc, id tiebreak on the 30s);
    # counts 5,5,5,5 with budget 12 → first two selected (5, 10), third
    # would reach 15 > 12.  NULL id/score/count rows are excluded.
    rows = [
        (1, 10.0, 5), (2, 30.0, 5), (3, 30.0, 5), (4, 40.0, 5),
        (None, 99.0, 5), (5, None, 5), (6, 50.0, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, n long")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in sampling.select_until_budget(
            df, budget=12, score_col="score", count_col="n", num_ranges=3
        ).collect()
    }
    assert got == {4: 5, 2: 10}
    # inclusive boundary: budget 15 admits exactly the third doc
    got15 = {
        r["doc_id"]: r["cum_tokens"]
        for r in sampling.select_until_budget(
            df, budget=15, score_col="score", count_col="n", num_ranges=3
        ).collect()
    }
    assert got15 == {4: 5, 2: 10, 3: 15}
    with pytest.raises(ValueError):
        sampling.select_until_budget(df, 0, score_col="score", count_col="n")


def test_select_until_budget_partition_invariant_and_oracle(spark):
    # the selected set must not depend on num_ranges or input layout,
    # and must equal the single-order SQL window replayed in DuckDB
    docs = _docs(spark).selectExpr(
        "doc_id",
        "size(filter(split(text, ' '), t -> t != '')) AS n_tokens",
        "n_chars AS score",
    ).where("doc_id IS NOT NULL AND n_tokens > 0")
    budget = 3000
    base = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in sampling.select_until_budget(
            docs, budget, score_col="score", count_col="n_tokens", num_ranges=8
        ).collect()
    )
    for variant in (
        sampling.select_until_budget(
            docs.repartition(17), budget, score_col="score",
            count_col="n_tokens", num_ranges=1,
        ),
        sampling.select_until_budget(
            docs, budget, score_col="score", count_col="n_tokens",
            num_ranges=200,  # more ranges than rows → empty slices
        ),
    ):
        assert sorted((r["doc_id"], r["cum_tokens"]) for r in variant.collect()) == base
    want = sorted(
        (r[0], r[1])
        for r in duckdb.sql(
            f"""WITH q AS (
              SELECT doc_id, n_chars AS score,
                     len(list_filter(string_split(text,' '), t -> t <> '')) AS n
              FROM '{SF}/documents.parquet'
              WHERE doc_id IS NOT NULL
            ), c AS (
              SELECT doc_id, sum(n) OVER (ORDER BY score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM q WHERE n > 0
            ) SELECT doc_id, cast(cum AS bigint) FROM c WHERE cum <= {budget}"""
        ).fetchall()
    )
    assert base == want and 0 < len(base) < docs.count()


def test_split_by_cluster_semantics(spark):
    from evalidate_spark.functions import dedup

    # chain 1-2-3 is one cluster; 10 and 11 singletons; NULL id dropped
    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (10,), (11,), (None,)], "doc_id long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    cl = dedup.duplicate_clusters(pairs)
    out = sampling.split_by_cluster(docs, cl, holdout_fraction=0.5).collect()
    by_id = {r["doc_id"]: (r["cluster"], r["split"]) for r in out}
    assert len(by_id) == 5  # NULL id excluded
    # cluster members share cluster AND split
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[1][0] == 1
    # singletons are their own cluster
    assert by_id[10][0] == 10 and by_id[11][0] == 11
    assert all(s in ("train", "holdout") for _, s in by_id.values())
    # boundary fractions pin every cluster to one side
    all_h = sampling.split_by_cluster(docs, cl, holdout_fraction=1.0)
    assert {r["split"] for r in all_h.collect()} == {"holdout"}
    all_t = sampling.split_by_cluster(docs, cl, holdout_fraction=0.0)
    assert {r["split"] for r in all_t.collect()} == {"train"}
    with pytest.raises(ValueError):
        sampling.split_by_cluster(docs, cl, holdout_fraction=1.5)


def test_split_by_cluster_no_leakage_on_corpus(spark):
    from evalidate_spark.functions import dedup

    ids = _docs(spark).select("doc_id").where("doc_id IS NOT NULL")
    pairs = ids.selectExpr("doc_id AS id_a", "doc_id + 1 AS id_b").where(
        "id_a % 10 < 3"
    ).join(ids.selectExpr("doc_id AS id_b"), "id_b")
    cl = dedup.duplicate_clusters(pairs)
    out = sampling.split_by_cluster(ids, cl, holdout_fraction=0.25)
    # no cluster straddles the split, and both splits are non-empty
    straddle = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert straddle == 0
    frac = out.where("split = 'holdout'").count() / out.count()
    assert 0.10 < frac < 0.40


class TestRebalanceMixture:
    def test_quota_math_nulls_and_determinism(self, spark):
        from evalidate_spark.functions.sampling import rebalance_mixture

        # groups of 8 / 2 / 4 docs (+ NULL-key group of 2, NULL id dropped)
        rows = (
            [(i, "big") for i in range(8)]
            + [(20, "tiny"), (21, "tiny")]
            + [(30 + i, "mid") for i in range(4)]
            + [(40, None), (41, None), (None, "big")]
        )
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = rebalance_mixture(df, "source", alpha=0.5)
        got = {}
        for r in out.collect():
            got[r["source"]] = got.get(r["source"], 0) + 1
        # cmin=2: quotas floor(sqrt(c*2)) -> big 4, tiny 2, mid 2, NULL 2
        assert got == {"big": 4, "tiny": 2, "mid": 2, None: 2}
        # deterministic: same rows on a different layout
        again = rebalance_mixture(df.repartition(7), "source", alpha=0.5)
        assert {tuple(r) for r in again.collect()} == {
            tuple(r) for r in out.collect()
        }
        # alpha=1 keeps the natural mix (minus NULL ids)
        assert rebalance_mixture(df, "source", alpha=1.0).count() == 16
        with pytest.raises(ValueError):
            rebalance_mixture(df, "source", alpha=0.0)

    def test_generic_alpha_keeps_min_group_whole(self, spark):
        from evalidate_spark.functions.sampling import rebalance_mixture

        # pow(4,0.3)*pow(4,0.7) = 4 - 1ulp floors to 3 without the clamp
        rows = [(i, "big") for i in range(100)] + [
            (200 + i, "small") for i in range(4)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = {}
        for r in rebalance_mixture(df, "source", alpha=0.3).collect():
            got[r["source"]] = got.get(r["source"], 0) + 1
        assert got["small"] == 4
        # quota never exceeds the group: floor(100^0.3 * 4^0.7) = 10
        assert got["big"] == 10


class TestCapPerKey:
    def test_cap_order_nulls_and_key_groups(self, spark):
        from evalidate_spark.functions.sampling import cap_per_key

        rows = [
            (1, "a", 10.0), (2, "a", 30.0), (3, "a", 20.0), (4, "a", None),
            (5, "b", 5.0),
            (6, None, 7.0), (7, None, 9.0),   # NULL key = its own group
            (None, "a", 99.0),                 # NULL id excluded
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, score double")
        got = {
            (r["source"], r["doc_id"])
            for r in cap_per_key(df, "source", 2, "score").collect()
        }
        # a: best two by score desc; NULL score ranks last; NULL id gone
        assert got == {("a", 2), ("a", 3), ("b", 5), (None, 7), (None, 6)}
        asc = {
            (r["source"], r["doc_id"])
            for r in cap_per_key(df, "source", 2, "score", descending=False).collect()
        }
        assert asc == {("a", 1), ("a", 3), ("b", 5), (None, 6), (None, 7)}
        with pytest.raises(ValueError):
            cap_per_key(df, "source", 0, "score")


class TestShufflePlan:
    """Deterministic epoch shuffle: (shard, pos) coordinates from
    md5(salt:epoch:id) — reproducible, epoch-sensitive, partition- and
    cluster-size-invariant, exported in readable pos order."""

    def test_permutation_and_determinism(self, spark):
        docs = _docs(spark)
        p1 = sampling.shuffle_plan(docs, n_shards=4, epoch=0)
        rows = p1.collect()
        n = docs.filter(F.col("doc_id").isNotNull()).count()
        assert len(rows) == n
        # every doc exactly once; pos is 1..|shard| dense per shard
        assert len({r["doc_id"] for r in rows}) == n
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(4))
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        # identical re-run, identical result (no RNG state anywhere)
        p2 = sampling.shuffle_plan(docs, n_shards=4, epoch=0)
        assert sorted(map(tuple, p2.collect())) == sorted(map(tuple, rows))
        # partitioning must not change the plan (cluster-size invariance)
        p3 = sampling.shuffle_plan(docs.repartition(13), n_shards=4, epoch=0)
        assert sorted(map(tuple, p3.collect())) == sorted(map(tuple, rows))

    def test_epoch_redeals(self, spark):
        docs = _docs(spark)
        e0 = {(r["doc_id"], r["shard"], r["pos"])
              for r in sampling.shuffle_plan(docs, 4, epoch=0).collect()}
        e1 = {(r["doc_id"], r["shard"], r["pos"])
              for r in sampling.shuffle_plan(docs, 4, epoch=1).collect()}
        # same docs, different deal: a large majority of coordinates move
        assert {d for d, _, _ in e0} == {d for d, _, _ in e1}
        assert len(e0 & e1) < len(e0) * 0.2

    def test_single_exchange(self, spark):
        docs = _docs(spark)
        plan = sampling.shuffle_plan(docs, 8, epoch=0)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1

    def test_null_ids_excluded_and_bad_args(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("b",)], "doc_id string"
        )
        got = sampling.shuffle_plan(df, 2).collect()
        assert {r["doc_id"] for r in got} == {"a", "b"}
        with pytest.raises(ValueError, match="positive"):
            sampling.shuffle_plan(df, 0)

    def test_shuffled_export_order(self, spark, tmp_path):
        docs = _docs(spark).select("doc_id", "text")
        out = str(tmp_path / "shuffled")
        sampling.shuffled_export(docs, out, n_shards=4, epoch=2,
                                 rows_per_file=50)
        plan = {
            (r["doc_id"]): (r["shard"], r["pos"])
            for r in sampling.shuffle_plan(docs, 4, epoch=2).collect()
        }
        back = spark.read.parquet(out)
        assert back.count() == len(plan)
        # coordinates match the plan exactly
        for r in back.select("doc_id", "shard", "pos").collect():
            assert plan[r["doc_id"]] == (r["shard"], r["pos"])
        # physical row order within each shard dir IS pos order, and
        # rolled files respect it (file k = positions [k*50, (k+1)*50))
        import glob
        for s in range(4):
            files = sorted(glob.glob(f"{out}/shard={s}/*.parquet"))
            assert files, f"shard {s} missing"
            seen = []
            for fp in files:
                import pyarrow.parquet as pq
                part = pq.read_table(fp, columns=["pos"])["pos"].to_pylist()
                assert part == sorted(part)
                assert len(part) <= 50
                seen += part
            assert seen == sorted(seen) == list(range(1, len(seen) + 1))


def test_split_multiway_semantics_and_nesting(spark):
    from evalidate_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i,) for i in range(200)] + [(None,)], "doc_id long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    cl = dedup.duplicate_clusters(pairs)

    out = sampling.split_multiway(
        docs, cl, {"test": 0.2, "val": 0.2}
    ).collect()
    by_id = {r["doc_id"]: (r["cluster"], r["split"]) for r in out}
    assert len(by_id) == 200  # NULL id excluded
    assert by_id[1] == by_id[2] == by_id[3]  # whole cluster together
    assert {s for _, s in by_id.values()} == {"test", "val", "train"}

    # two-way form is the degenerate case of the multiway form
    two = {
        r["doc_id"]: r["split"]
        for r in sampling.split_by_cluster(docs, cl, 0.25).collect()
    }
    multi = {
        r["doc_id"]: r["split"]
        for r in sampling.split_multiway(docs, cl, {"holdout": 0.25}).collect()
    }
    assert two == multi

    # nesting: growing a leading fraction only moves docs from REST into
    # it — the existing test/val assignment never reshuffles
    grown = {
        r["doc_id"]: r["split"]
        for r in sampling.split_multiway(
            docs, cl, {"test": 0.3, "val": 0.2}
        ).collect()
    }
    for i, s in by_id.items():
        if s[1] == "test":
            assert grown[i] == "test"
    # val shifts window when test grows (documented: intervals are
    # contiguous in insertion order) — but train never invades test/val
    assert sum(1 for v in grown.values() if v == "test") >= sum(
        1 for _, v in by_id.values() if v == "test"
    )

    # fractions summing to 1 leave rest empty; invalid args raise
    full = sampling.split_multiway(docs, cl, {"a": 0.5, "b": 0.5})
    assert {r["split"] for r in full.collect()} == {"a", "b"}
    with pytest.raises(ValueError):
        sampling.split_multiway(docs, cl, {"train": 0.5})
    with pytest.raises(ValueError):
        sampling.split_multiway(docs, cl, {"a": 0.6, "b": 0.6})
    with pytest.raises(ValueError):
        sampling.split_multiway(docs, cl, {"a": -0.1})


class TestWeightedSample:
    def _docs(self, spark):
        rows = [(i, float(1 if i < 80 else 100)) for i in range(100)]
        rows += [(None, 5.0), (200, None), (201, 0.0), (202, -3.0)]
        return spark.createDataFrame(rows, "doc_id long, w double")

    def test_determinism_and_exclusions(self, spark):
        d = self._docs(spark)
        a = sampling.weighted_sample(d, 10, "w").collect()
        b = sampling.weighted_sample(d.repartition(7), 10, "w").collect()
        assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
        assert len(a) == 10
        ids = {r["doc_id"] for r in a}
        assert None not in ids and not ids & {200, 201, 202}

    def test_weight_bias(self, spark):
        # 20 heavy docs (w=100) vs 80 light (w=1): heavies carry ~20% of
        # rows but ~96% of mass — across salts they must dominate the
        # k=10 sample on average
        d = self._docs(spark)
        heavy = 0
        for s in range(8):
            got = sampling.weighted_sample(d, 10, "w", salt="t%d" % s)
            heavy += sum(1 for r in got.collect() if r["doc_id"] >= 80)
        assert heavy >= 8 * 10 * 0.6  # binomially safe bound

    def test_matches_pure_python_replay(self, spark):
        import hashlib, math

        d = self._docs(spark)
        got = sorted(
            r["doc_id"] for r in sampling.weighted_sample(d, 7, "w").collect()
        )

        def key(i, w):
            hx = hashlib.md5(("ws-v1%d" % i).encode()).hexdigest()[:13]
            u = (int(hx, 16) + 0.5) / float(1 << 52)
            return math.log(u) / w

        rows = [(i, 1.0 if i < 80 else 100.0) for i in range(100)]
        exp = sorted(
            i for i, _ in sorted(rows, key=lambda r: (-key(*r), r[0]))[:7]
        )
        assert got == exp

    def test_k_exceeds_population_and_stratified(self, spark):
        d = self._docs(spark)
        assert sampling.weighted_sample(d, 10_000, "w").count() == 100
        d2 = d.withColumn("g", (F.col("doc_id") % 2).cast("int"))
        out = sampling.weighted_sample(d2, 5, "w", by=["g"]).collect()
        from collections import Counter

        c = Counter(r["g"] for r in out)
        assert c[0] == 5 and c[1] == 5
        with pytest.raises(ValueError):
            sampling.weighted_sample(d, 0, "w")

    def test_global_plan_is_take_ordered(self, spark):
        d = self._docs(spark)
        plan = (
            sampling.weighted_sample(d, 10, "w")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
