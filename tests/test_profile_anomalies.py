"""Profile-state anomaly detection: null-rate jumps and volume drops
flagged from the state table alone; single-increment vacuity; integer
basis-point math hand-checked."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark.operators.table_checks import profile_anomalies, profile_state


def _states(spark, specs):
    """specs: list of (increment, n_rows, n_nulls) for a single column v."""
    parts = []
    for inc, n, nulls in specs:
        df = spark.range(n).select(
            F.when(F.col("id") >= nulls, F.col("id").cast("double")).alias("v")
        )
        parts.append(profile_state(df, ["v"], inc))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_null_jump_flagged(spark):
    # three healthy increments (1% nulls), one degraded (40%)
    st = _states(
        spark,
        [("i0", 1000, 10), ("i1", 1000, 10), ("i2", 1000, 10), ("bad", 1000, 400)],
    )
    out = {r["increment"]: r for r in profile_anomalies(st).collect()}
    assert out["bad"]["null_bp"] == 4000
    assert out["bad"]["base_null_bp"] == 100  # 30/3000
    assert out["bad"]["null_anomaly"] is True
    for inc in ("i0", "i1", "i2"):
        assert out[inc]["null_anomaly"] is False
        # healthy increments see the degraded one in their baseline
        assert out[inc]["base_null_bp"] == (400 + 10 + 10) * 10_000 // 3000


def test_volume_drop_flagged(spark):
    st = _states(spark, [("i0", 1000, 0), ("i1", 1000, 0), ("tiny", 100, 0)])
    out = {r["increment"]: r for r in profile_anomalies(st).collect()}
    # tiny vs mean(1000, 1000): 100*2*10000 div 2000 = 1000 bp
    assert out["tiny"]["volume_bp"] == 1000
    assert out["tiny"]["volume_anomaly"] is True
    assert out["i0"]["volume_anomaly"] is False


def test_single_increment_never_flagged(spark):
    st = _states(spark, [("only", 500, 250)])
    [r] = profile_anomalies(st).collect()
    assert r["base_null_bp"] is None and r["volume_bp"] is None
    assert r["null_anomaly"] is False and r["volume_anomaly"] is False


def test_requires_state_shape(spark):
    with pytest.raises(ValueError):
        profile_anomalies(spark.range(3).select(F.lit("x").alias("increment")))
