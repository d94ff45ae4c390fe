"""Compression-ratio quality signal: bit-level zlib pin, flag thresholds,
NULL/empty contracts, and the single-ArrowEvalPython map-only plan."""

import zlib

from evalidate_spark.functions.text import compression_signals

SCHEMA = "doc_id long, text string"

RAND120 = (
    "pTy,GJ&Mu-H#bEL31IeL(2H_Pc||-H+-yGcF)Rl1S*P+n)?XN-+;YvM(I_H}a@?&2o7"
    "-6umfX~fK+m^@r5k]JP$1VrT!1F<J)+or/s[@-6ILi8~<IH~n:+?5"
)

ROWS = [
    (1, "abc " * 500),          # boilerplate: compresses to nothing
    (2, "the quick brown fox jumps over the lazy dog while fifty "
        "carpenters measure twice and cut once in the bright workshop"),
    (3, None),                  # NULL passthrough
    (4, ""),                    # empty: raw 0 -> NULL ratio, flags false
    (5, "Zx9!kQ2@mP7#vR4$wT6%yU8^"),  # short: under min_bytes, no flags
    (6, "naïve café — ünïcode"),      # multi-byte UTF-8 counted in bytes
    (7, RAND120),               # 120B high-entropy: expands past 9500 bp
]


class TestCompressionSignals:
    def test_bit_pin_vs_zlib(self, spark):
        out = compression_signals(spark.createDataFrame(ROWS, SCHEMA))
        got = {r.doc_id: r for r in out.collect()}
        for doc_id, text in ROWS:
            r = got[doc_id]
            if text is None:
                assert r.n_bytes is None and r.n_compressed is None
                assert r.ratio_bp is None
                assert r.too_repetitive is False and r.too_random is False
                continue
            b = text.encode("utf-8")
            assert r.n_bytes == len(b)
            assert r.n_compressed == len(zlib.compress(b, 6))
            if len(b) == 0:
                assert r.ratio_bp is None
                assert r.too_repetitive is False and r.too_random is False
            else:
                assert r.ratio_bp == 10000 * r.n_compressed // len(b)

    def test_flags(self, spark):
        out = compression_signals(spark.createDataFrame(ROWS, SCHEMA))
        got = {r.doc_id: (r.too_repetitive, r.too_random) for r in out.collect()}
        assert got[1] == (True, False)   # ratio far below 3000 bp
        assert got[2] == (False, False)  # normal prose
        assert got[5] == (False, False)  # short: min_bytes mutes the
        # header-dominated quotient even though it expands
        assert got[7] == (False, True)   # long high-entropy: too_random

    def test_custom_thresholds_and_level(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        out = compression_signals(df, level=9, min_ratio_bp=1, max_ratio_bp=99999)
        for r in out.collect():
            assert r.too_repetitive is False and r.too_random is False
            if r.doc_id == 1:
                assert r.n_compressed == len(zlib.compress(ROWS[0][1].encode(), 9))

    def test_map_only_single_udf_plan(self, spark):
        out = compression_signals(spark.createDataFrame(ROWS, SCHEMA))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        assert "Exchange" not in plan
