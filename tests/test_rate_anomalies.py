"""rate_anomalies: per-bucket event-volume vs the mean of the other
buckets. Hand-computed bp, spike/drop flags, NULL-ts exclusion,
single-bucket contract, and arg validation."""

import pytest

from evalidate_spark.operators import table_checks

SCHEMA = "event_id long, ts_s string"


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA).selectExpr(
        "event_id", "cast(ts_s as timestamp) ts"
    )
    out = table_checks.rate_anomalies(df, "ts", **kw)
    return {r.bucket_s: r for r in out.collect()}


def ts(h, m=0):
    return "2024-01-01 %02d:%02d:00" % (h, m)


def test_spike_and_drop(spark):
    # hours 10,11,12 get 2,2,8 events; hour 13 gets 1
    rows = []
    eid = 0
    for h, n in ((10, 2), (11, 2), (12, 8), (13, 1)):
        for i in range(n):
            rows.append((eid, ts(h, i)))
            eid += 1
    got = run(spark, rows, bucket_s=3600, spike_bp=10000, drop_bp=5000)
    assert len(got) == 4
    base = 1704103200  # 2024-01-01 10:00:00 UTC
    h10, h11, h12, h13 = (got[base + k * 3600] for k in range(4))
    # hour 12: 8 vs mean(2,2,1)=5/3 -> 8*3*10000 div 5 = 48000 -> spike
    assert (h12.n_events, h12.rate_bp, h12.spike, h12.drop) == (8, 48000, True, False)
    # hour 13: 1 vs mean(2,2,8)=4 -> 1*3*10000 div 12 = 2500 -> drop
    assert (h13.n_events, h13.rate_bp, h13.spike, h13.drop) == (1, 2500, False, True)
    # hour 10: 2 vs mean(2,8,1)=11/3 -> 2*3*10000 div 11 = 5454 -> neither
    assert (h10.rate_bp, h10.spike, h10.drop) == (5454, False, False)
    assert h11.rate_bp == 5454


def test_null_ts_excluded_and_single_bucket(spark):
    got = run(spark, [(0, ts(10)), (1, ts(10, 5)), (2, None)], bucket_s=3600)
    assert len(got) == 1
    (r,) = got.values()
    assert r.n_events == 2          # NULL ts never counted
    assert r.rate_bp is None        # no other buckets
    assert r.spike is False and r.drop is False


def test_bad_args(spark):
    df = spark.createDataFrame([(0, ts(1))], SCHEMA)
    with pytest.raises(ValueError):
        table_checks.rate_anomalies(df, "ts", bucket_s=0)
    with pytest.raises(ValueError):
        table_checks.rate_anomalies(df, "ts", drop_bp=0)
    with pytest.raises(ValueError):
        table_checks.rate_anomalies(df, "ts", spike_bp=-1)
