"""canonicalize_url folds and write_training_shards layout contracts."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from evalidate_spark.functions.web import canonical_urls
from evalidate_spark.sources import write_training_shards

CASES = [
    # (raw, canonical, domain)
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
     "http://example.com/a/b?a=2&z=1", "example.com"),
    ("https://sub.site.com:443/p/", "https://sub.site.com/p", "sub.site.com"),
    ("https://site.com/path?b=2&a=1&fbclid=abc",
     "https://site.com/path?a=1&b=2", "site.com"),
    # non-default port survives; empty query folds away
    ("http://h.io:8080/x?", "http://h.io:8080/x", "h.io"),
    # userinfo dropped; root path folds to empty
    ("https://user:pw@Host.COM/", "https://host.com", "host.com"),
    # tracking-only query disappears entirely
    ("https://a.com/p?utm_campaign=c&gclid=1", "https://a.com/p", "a.com"),
    # utm prefix must not swallow ordinary params
    ("https://a.com/p?utmost=1", "https://a.com/p?utmost=1", "a.com"),
    # uppercase trackers fold too; repeated trailing slashes are idempotent
    ("https://a.com/x?UTM_SOURCE=feed&b=1", "https://a.com/x?b=1", "a.com"),
    ("https://a.com/p//", "https://a.com/p", "a.com"),
    ("ftp://files.com/x", None, None),
    ("not a url", None, None),
    (None, None, None),
]


def test_canonicalize_url_folds(spark):
    rows = [(i, c[0]) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in canonical_urls(df).collect()}
    for i, (raw, canon, domain) in enumerate(CASES):
        assert got[i].url_canon == canon, (raw, got[i].url_canon)
        assert got[i].domain == domain, (raw, got[i].domain)
    assert got[0].is_web is True
    assert got[len(CASES) - 2].is_web is False  # "not a url"
    assert got[len(CASES) - 1].is_web is None  # NULL url → NULL verdict


def test_canonical_collision_is_dedup_key(spark):
    variants = [
        (1, "https://WWW.Site.com/a/"),
        (2, "https://site.com:443/a"),
        (3, "https://site.com/a?utm_source=feed"),
    ]
    df = canonical_urls(spark.createDataFrame(variants, "doc_id long, url string"))
    assert df.select("url_canon").distinct().count() == 1


def test_write_training_shards_bounds_and_roundtrip(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = spark.range(10_000).selectExpr("id", "id % 17 as grp")
    write_training_shards(df, path, rows_per_shard=1_000, order_cols=["id"])
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 10
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= 1_000
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))
    # range layout: per-file min/max id windows must not overlap
    spans = sorted(
        (pq.read_table(f, columns=["id"])["id"].to_pylist()) for f in files
    )
    flat = [v for s in spans for v in sorted(s)]
    assert flat == sorted(flat)
