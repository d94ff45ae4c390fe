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
