"""Mergeable KLL quantile states: exact count/min/max through the state
fold, quantile estimates within sketch rank error, merge order
insensitivity (tolerance — KLL compaction is randomized), KS drift
detection between state sets, and empty/NULL contracts."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark.operators.table_checks import (
    merge_quantile_states,
    quantile_drift_states,
    quantile_state,
)


@pytest.fixture(scope="module")
def data(spark):
    # uniform 0..99 (v) and 0..9999 (w), with some NULLs in v
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 100 != 0, (F.col("id") % 100).cast("double")).alias("v"),
        (F.col("id") * 1.0).alias("w"),
    )


def _mk_states(data, n_inc=4):
    d = data.withColumn("__r", F.monotonically_increasing_id())
    return [
        quantile_state(d.filter(F.pmod("__r", F.lit(n_inc)) == i), ["v", "w"], f"i{i}")
        for i in range(n_inc)
    ]


def test_exact_fields_and_estimates(spark, data):
    parts = _mk_states(data)
    st = parts[0]
    for p in parts[1:]:
        st = st.unionByName(p)
    out = {r["column"]: r for r in merge_quantile_states(st).collect()}
    # v: 100 NULLs (every id%100==0), values 1..99
    assert out["v"]["n_values"] == 9_900
    assert out["v"]["min_val"] == 1.0 and out["v"]["max_val"] == 99.0
    assert out["w"]["n_values"] == 10_000
    assert out["w"]["min_val"] == 0.0 and out["w"]["max_val"] == 9999.0
    # estimates within ~2% rank error of uniform truth
    assert abs(out["w"]["q_50"] - 5000.0) < 400
    assert abs(out["w"]["q_90"] - 9000.0) < 400
    assert abs(out["v"]["q_25"] - 25.0) < 4


def test_merge_order_insensitive_within_error(spark, data):
    parts = _mk_states(data)
    fwd = parts[0]
    for p in parts[1:]:
        fwd = fwd.unionByName(p)
    rev = parts[-1]
    for p in reversed(parts[:-1]):
        rev = rev.unionByName(p)
    a = {r["column"]: r for r in merge_quantile_states(fwd).collect()}
    b = {r["column"]: r for r in merge_quantile_states(rev).collect()}
    for c in ("v", "w"):
        assert a[c]["n_values"] == b[c]["n_values"]
        assert a[c]["min_val"] == b[c]["min_val"]
        assert a[c]["max_val"] == b[c]["max_val"]
        span = a[c]["max_val"] - a[c]["min_val"]
        for q in ("q_25", "q_50", "q_75", "q_90", "q_99"):
            assert abs(a[c][q] - b[c][q]) <= 0.05 * span


def test_drift_detects_shift_and_stability(spark, data):
    base = _mk_states(data)
    st = base[0]
    for p in base[1:]:
        st = st.unionByName(p)
    shifted = data.select((F.col("v") + 50).alias("v"), "w")
    cur = quantile_state(shifted, ["v", "w"], "cur")
    out = {r["column"]: r for r in quantile_drift_states(st, cur).collect()}
    # v shifted by half its range: true KS = 0.5 → ~5000 bp
    assert 4_000 < out["v"]["ks_bp"] < 6_000
    # w unchanged: near zero
    assert out["w"]["ks_bp"] < 500
    assert out["v"]["n_baseline"] == 9_900 and out["v"]["n_current"] == 9_900


def test_drift_empty_side_is_null(spark, data):
    st = quantile_state(data, ["v", "w"], "all")
    empty = quantile_state(data.filter(F.lit(False)), ["v", "w"], "none")
    out = {r["column"]: r for r in quantile_drift_states(st, empty).collect()}
    for c in ("v", "w"):
        assert out[c]["ks_bp"] is None
        assert out[c]["n_current"] == 0


def test_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    st = quantile_state(df, ["v"], "x")
    out = merge_quantile_states(st).collect()[0]
    assert out["n_values"] == 0
    assert out["min_val"] is None and out["q_50"] is None


def test_drift_sees_moved_point_mass_between_grid_lines(spark):
    """Review regression: probing an even value grid misses a point mass
    that moves between adjacent grid lines; probing each sketch's own
    quantile values must catch it (true KS ≈ 0.99 here)."""
    base = spark.createDataFrame(
        [(0.0,)] + [(100.25,)] * 99, "v double"
    )
    cur = spark.createDataFrame(
        [(0.0,)] + [(100.75,)] * 99, "v double"
    )
    bs = quantile_state(base, ["v"], "b")
    cs = quantile_state(cur, ["v"], "c")
    r = quantile_drift_states(bs, cs).collect()[0]
    assert r["ks_bp"] > 9_000
