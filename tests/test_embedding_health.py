"""embedding_health: the one-row vector-corpus gate. Counters are checked
against a hand-built corpus covering every pathology (NULL vector, empty,
wrong width, NULL element, NaN, ±Inf, zero-norm, zeros-and-NULLs), plus
the empty-table contract and the single-exchange plan shape."""

import pytest

from evalidate_spark.operators import table_checks

SCHEMA = "vec_id long, embedding array<float>"

CORPUS = [
    (0, [1.0, 2.0, 3.0]),            # healthy
    (1, [0.5, -0.5, 0.25]),          # healthy
    (2, None),                       # NULL vector
    (3, []),                         # empty (also wrong-dim? no: len 0 != 3 -> wrong_dim counts it)
    (4, [1.0, 2.0]),                 # wrong width
    (5, [1.0, None, 0.0]),           # NULL element
    (6, [float("nan"), 1.0, 2.0]),   # NaN
    (7, [float("inf"), 1.0, 2.0]),   # +Inf
    (8, [-float("inf"), 1.0, 2.0]),  # -Inf
    (9, [0.0, 0.0, 0.0]),            # zero-norm
    (10, [0.0, None, 0.0]),          # zeros-and-NULLs: null_elem, NOT zero-norm
]


def report(spark, rows, dim=3):
    df = spark.createDataFrame(rows, SCHEMA)
    return table_checks.embedding_health(df, "embedding", expected_dim=dim).first()


def test_counters(spark):
    r = report(spark, CORPUS)
    assert r.n_rows == 11
    assert r.n_null_vec == 1
    assert r.n_empty_vec == 1
    # wrong width vs 3: the empty vec (len 0) and the 2-vec
    assert r.n_wrong_dim == 2
    assert r.min_dim == 0 and r.max_dim == 3
    assert r.n_null_elem == 2          # ids 5 and 10
    assert r.n_nonfinite == 3          # NaN, +Inf, -Inf
    assert r.n_zero_norm == 1          # id 9 only; id 10 has a NULL element


def test_healthy_only(spark):
    r = report(spark, [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])])
    assert (
        r.n_null_vec, r.n_empty_vec, r.n_wrong_dim,
        r.n_null_elem, r.n_nonfinite, r.n_zero_norm,
    ) == (0, 0, 0, 0, 0, 0)
    assert r.n_rows == 2 and r.min_dim == 3 and r.max_dim == 3


def test_empty_table(spark):
    r = report(spark, [])
    assert r.n_rows == 0
    assert r.n_null_vec == 0 and r.n_nonfinite == 0 and r.n_zero_norm == 0
    assert r.min_dim is None and r.max_dim is None


def test_all_null(spark):
    r = report(spark, [(0, None), (1, None)])
    assert r.n_rows == 2 and r.n_null_vec == 2
    assert r.min_dim is None and r.max_dim is None


def test_bad_dim_raises(spark):
    df = spark.createDataFrame([(0, [1.0])], SCHEMA)
    with pytest.raises(ValueError):
        table_checks.embedding_health(df, "embedding", expected_dim=0)


def test_single_aggregate_plan(spark):
    """Vectors never shuffle: exactly one Exchange (the 1-row final agg),
    no Window, no Generate in the physical plan."""
    df = spark.createDataFrame(CORPUS, SCHEMA)
    plan = table_checks.embedding_health(
        df, "embedding", expected_dim=3
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Generate" not in plan


class TestEmbeddingHealthTrend:
    """Per-wave twin: counter placement on the ingest axis, NULL-id
    exclusion, n_valid contract, validation, and the plan shape (one
    wave-keyed exchange; vectors never shuffle)."""

    def _trend(self, spark, rows, dim=3, n_waves=2):
        df = spark.createDataFrame(rows, SCHEMA)
        return {
            r["wave"]: r
            for r in table_checks.embedding_health_trend(
                df, "embedding", "vec_id", expected_dim=dim, n_waves=n_waves
            ).collect()
        }

    def test_counters_land_in_the_right_wave(self, spark):
        # ids 0-4 -> wave 0, ids 5-9 -> wave 1 (m = 10, 2 waves)
        rows = [
            (0, [1.0, 2.0, 3.0]),           # healthy, wave 0
            (1, None),                      # null vec, wave 0
            (2, [float("nan"), 1.0, 2.0]),  # nonfinite, wave 0
            (5, [1.0, 2.0]),                # wrong dim, wave 1
            (6, [0.0, 0.0, 0.0]),           # zero-norm (valid), wave 1
            (9, [1.0, None, 3.0]),          # null elem, wave 1
        ]
        t = self._trend(spark, rows)
        assert set(t) == {0, 1}
        w0, w1 = t[0], t[1]
        assert (w0.n_rows, w0.n_null_vec, w0.n_nonfinite, w0.n_valid) == (3, 1, 1, 1)
        assert (w1.n_rows, w1.n_wrong_dim, w1.n_zero_norm, w1.n_null_elem) == (3, 1, 1, 1)
        # zero-norm IS valid (scores 0.0 by contract); null-elem is not
        assert w1.n_valid == 1

    def test_null_ids_are_excluded_from_the_axis(self, spark):
        rows = [(0, [1.0, 2.0, 3.0]), (None, [float("nan")] * 3)]
        t = self._trend(spark, rows)
        assert sum(r.n_rows for r in t.values()) == 1
        assert all(r.n_nonfinite == 0 for r in t.values())

    def test_single_wave_equals_global_counters(self, spark):
        t = self._trend(spark, CORPUS, n_waves=1)
        g = report(spark, CORPUS)
        r = t[0]
        # NULL-id rows: none in CORPUS, so the single wave == global
        assert (r.n_rows, r.n_null_vec, r.n_wrong_dim) == (
            g.n_rows, g.n_null_vec, g.n_wrong_dim
        )
        assert (r.n_null_elem, r.n_nonfinite, r.n_zero_norm) == (
            g.n_null_elem, g.n_nonfinite, g.n_zero_norm
        )

    def test_validation(self, spark):
        df = spark.createDataFrame(CORPUS, SCHEMA)
        with pytest.raises(ValueError):
            table_checks.embedding_health_trend(df, expected_dim=0)
        with pytest.raises(ValueError):
            table_checks.embedding_health_trend(df, expected_dim=3, n_waves=0)

    def test_vectors_never_shuffle(self, spark):
        df = spark.createDataFrame(CORPUS, SCHEMA)
        plan = (
            table_checks.embedding_health_trend(df, expected_dim=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # partial aggregation before the exchange: the shuffle carries
        # per-partition counter rows keyed by wave, not embedding arrays
        assert "partial" in plan.lower()
