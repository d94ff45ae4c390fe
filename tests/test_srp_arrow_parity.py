"""Arrow/HOF twin pin for the SRP integer-dot core (`_with_srp_dots`):
the default Arrow path (one int64 numpy matmul per batch) must be
BIT-IDENTICAL to the pure-Column HOF fold the DuckDB oracles replay —
integer addition is associative, so any divergence means the
quantisation (Spark `F.round` HALF_UP vs sign-aware floor(|x|·s+0.5))
or the plane matrix drifted.  Randomized vectors + the adversarial
shapes that stress the rounding boundary (exact .5 products, negative
zero, tiny magnitudes, the hostile embedding corpus)."""

import pytest
from pyspark.sql import functions as F

from evalidate_spark.fixtures import HOSTILE_EMBEDDINGS
from evalidate_spark.functions.similarity import _vec_ok, _with_srp_dots


def _dots(spark, rows, dim, n_planes=8, scale=1_000_000):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "id long, v array<float>"
    ).select("id", F.col("v").alias("__v"))
    out = {}
    for method in ("arrow", "hof"):
        got = (
            _with_srp_dots(df, n_planes, dim, scale, method=method)
            .select("id", "__dots")
            .collect()
        )
        out[method] = {r["id"]: list(r["__dots"]) for r in got}
    return out


def test_arrow_equals_hof_on_random_vectors(spark):
    import random

    rng = random.Random(42)
    dim = 16
    rows = [
        [rng.uniform(-3, 3) for _ in range(dim)] for _ in range(200)
    ]
    got = _dots(spark, rows, dim)
    assert got["arrow"] == got["hof"]
    # sanity: dots are non-trivial (not all zero)
    assert any(any(d != 0 for d in ds) for ds in got["arrow"].values())


def test_arrow_equals_hof_on_rounding_boundaries(spark):
    # products landing exactly on .5 (HALF_UP away from zero), negative
    # zero, sub-quantum magnitudes, and exact integers after scaling
    dim = 4
    rows = [
        [0.0000005, -0.0000005, 0.0000015, -0.0000025],  # exact .5 ties
        [-0.0, 0.0, 1e-9, -1e-9],                        # signed zero + tiny
        [1.0, -1.0, 0.5, -0.5],                          # exact integers
        [2.9999995, -2.9999995, 1e-7, -1e-7],
    ]
    got = _dots(spark, rows, dim)
    assert got["arrow"] == got["hof"]


def test_arrow_equals_hof_on_hostile_corpus(spark):
    dim = 64
    df = spark.createDataFrame(
        [(i, r[1]) for i, r in enumerate(HOSTILE_EMBEDDINGS)],
        "id long, v array<float>",
    ).filter(_vec_ok(F.col("v"), dim)).select("id", F.col("v").alias("__v"))
    a = {
        r["id"]: list(r["__dots"])
        for r in _with_srp_dots(df, 8, dim, 1_000_000, method="arrow")
        .select("id", "__dots")
        .collect()
    }
    h = {
        r["id"]: list(r["__dots"])
        for r in _with_srp_dots(df, 8, dim, 1_000_000, method="hof")
        .select("id", "__dots")
        .collect()
    }
    assert a and a == h


def test_arrow_path_is_in_the_plan(spark):
    """The default method really is the Arrow one (an ArrowEvalPython
    stage), and the HOF twin really is pure-Column (no Python nodes) —
    guards against a silent default flip in either direction."""
    df = spark.createDataFrame([(1, [0.5] * 8)], "id long, v array<float>")
    df = df.select("id", F.col("v").alias("__v"))
    arrow_plan = (
        _with_srp_dots(df, 4, 8, 1_000_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    hof_plan = (
        _with_srp_dots(df, 4, 8, 1_000_000, method="hof")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in arrow_plan
    assert "ArrowEvalPython" not in hof_plan
    assert "BatchEvalPython" not in hof_plan


class TestLshBucketArrowParity:
    """Float LSH bucket twin (`lsh_bucket_pairs` method=arrow vs hof):
    not formally order-independent like the integer family, so the pin
    is fixture equality — random vectors, the hostile corpus, and the
    full pair output of an injected-duplicate construction."""

    def _pairs(self, spark, rows, method, planes=8, dim=4):
        from evalidate_spark.functions.similarity import lsh_bucket_pairs

        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = lsh_bucket_pairs(
            df, planes=planes, max_bucket=64, dim=dim, method=method
        ).collect()
        return sorted(
            (r["id_a"], r["id_b"], r["cosine"], r["truncated"]) for r in got
        )

    def test_pair_outputs_equal_on_random_corpus(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(80)
        ] + [(1000 + i, [rng.uniform(-1, 1)] * 4) for i in range(5)]
        a = self._pairs(spark, rows, "arrow")
        h = self._pairs(spark, rows, "hof")
        assert a == h
        assert a  # non-vacuous: some bucket produced pairs

    def test_exact_duplicates_always_pair_either_method(self, spark):
        v = [0.3, -0.2, 0.9, 0.1]
        rows = [(1, v), (2, v), (3, [-0.9, 0.4, 0.0, -0.3])]
        for method in ("arrow", "hof"):
            pairs = self._pairs(spark, rows, method)
            assert any(p[:2] == (1, 2) and p[2] == 1.0 for p in pairs)

    def test_hostile_corpus_equal_and_nonfinite_excluded(self, spark):
        from evalidate_spark.fixtures import HOSTILE_EMBEDDINGS

        rows = [
            (i, r[1]) for i, r in enumerate(HOSTILE_EMBEDDINGS)
            if r[1] is not None
        ]
        a = self._pairs(spark, rows, "arrow", dim=64)
        h = self._pairs(spark, rows, "hof", dim=64)
        assert a == h
        nonfinite_ix = {
            i for i, r in enumerate(HOSTILE_EMBEDDINGS)
            if r[1] is not None
            and any(x is None or x != x or abs(x) == float("inf") for x in r[1])
        }
        assert nonfinite_ix  # the corpus really carries non-finite rows
        assert all(
            p[0] not in nonfinite_ix and p[1] not in nonfinite_ix for p in a
        )
