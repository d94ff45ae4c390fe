"""Encoding-anomaly counters: hand-built damaged strings, NULL/clean
contracts, and the zero-shuffle plan shape."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark.functions.text import encoding_anomalies

CASES = [
    ("ok", "perfectly clean ascii text", (0, 0, 0, True)),
    ("uni", "café naïve — legit utf-8 ≠ mojibake", (0, 0, 0, True)),
    ("repl", "lossy � decode � here", (2, 0, 0, False)),
    ("ctrl", "bell\x07 and null\x00 and c1\x85", (0, 3, 0, False)),
    ("tabs", "tab\t newline\n cr\r are fine", (0, 0, 0, True)),
    ("moji", "cafÃ© â€™quoteâ€", (0, 1, 3, False)),
    ("null", None, (0, 0, 0, True)),
    ("empty", "", (0, 0, 0, True)),
]


@pytest.fixture(scope="module")
def damaged(spark):
    return spark.createDataFrame(
        [(k, t) for k, t, _ in CASES], "k string, t string"
    )


def test_counts(damaged):
    out = {
        r["k"]: (r["repl_chars"], r["ctrl_chars"], r["mojibake_seqs"], r["clean"])
        for r in damaged.select(
            "k", encoding_anomalies(F.col("t")).alias("e")
        ).select("k", "e.*").collect()
    }
    for k, _, expect in CASES:
        assert out[k] == expect, k


def test_plan_is_projection_only(damaged):
    plan = (
        damaged.select(encoding_anomalies(F.col("t")).alias("e"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------- html strip
from evalidate_spark.functions.text import html_to_text

HTML_CASES = [
    # block closers (</p>, </li>) become REAL newlines in the output —
    # line-oriented consumers downstream see paragraph boundaries
    ("full",
     '<html><head><style>p{x}</style></head><body><p>Hello &amp; '
     '<b>world</b></p><script>var x="z";</script><ul><li>a</li>'
     '<li>b</li></ul><!-- note --></body></html>',
     "Hello & world\na\nb"),
    ("plain", "no markup at   all", "no markup at all"),
    ("keeps_newlines", "para one\n\npara two", "para one\npara two"),
    ("entities", "&lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;x", '<tag> "q" \'s\' x'),
    ("amp_last", "&amp;lt;", "&lt;"),
    ("multiline_script", "a<script>\nline1\nline2\n</script>b", "a b"),
    ("case", "<SCRIPT>x</SCRIPT><P>Y</P>", "Y"),
    ("null", None, None),
    ("empty", "", ""),
]


def test_html_to_text(spark):
    df = spark.createDataFrame([(k, t) for k, t, _ in HTML_CASES], "k string, t string")
    out = {
        r["k"]: r["s"]
        for r in df.select("k", html_to_text(F.col("t")).alias("s")).collect()
    }
    for k, _, want in HTML_CASES:
        assert out[k] == want, (k, out[k])
