"""Property pins for `fixtures.gen_embeddings` (the vector-family
scaling-bench input): parallelism-independent determinism, the
noise-scale spike envelope, and the twin construction's SRP-sign
preservation — the three facts the BENCH.md vector leg relies on."""

import pytest
from pyspark.sql import functions as F

from evalidate_spark.fixtures import gen_embeddings


def _rows(spark, n, partitions):
    return {
        r["vec_id"]: (tuple(r["embedding"]), r["label"])
        for r in gen_embeddings(spark, n, partitions=partitions).collect()
    }


def test_deterministic_across_parallelism(spark):
    a = _rows(spark, 300, 3)
    b = _rows(spark, 300, 17)
    assert a == b
    # twins present at the documented offset
    assert set(a) == set(range(300)) | {300 + i for i in range(0, 300, 25)}


def test_envelope_and_entropy(spark):
    df = gen_embeddings(spark, 500)
    # spike 0.2 + noise <=0.2 → |x| <= 0.4·1.01; finite everywhere
    stats = df.select(
        F.max(F.aggregate(
            "embedding", F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        )).alias("amax"),
        F.min(F.size("embedding")).alias("mindim"),
        F.max(F.size("embedding")).alias("maxdim"),
    ).first()
    assert stats["amax"] <= 0.4 * 1.01 + 1e-9
    assert stats["mindim"] == stats["maxdim"] == 64
    # bucket entropy: first-8-dim sign patterns must spread (the
    # mega-bucket regression guard — a dominant spike collapses these)
    pat = df.select(
        F.concat_ws(
            "",
            *[
                (F.element_at("embedding", i + 1) >= 0).cast("int").cast("string")
                for i in range(8)
            ]
        ).alias("p")
    )
    n_patterns = pat.distinct().count()
    assert n_patterns > 100  # out of 256 possible — high-entropy spread


def test_twins_preserve_srp_sign_bits(spark):
    from evalidate_spark.functions.similarity import srp_candidates_md5

    corpus = gen_embeddings(spark, 1000)
    pairs = srp_candidates_md5(
        corpus, n_planes=32, bands=2, dim=64, max_bucket=4096, min_cosine=0.9
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every (i, i+n_vecs) twin collides in all bands and passes the
    # exact-cosine gate: recall 1.0 by construction
    want = {(i, 1000 + i) for i in range(0, 1000, 25)}
    assert want <= got
    for r in pairs:
        if (r["id_a"], r["id_b"]) in want:
            assert r["n_bands"] == 2 and r["cosine"] >= 0.999
