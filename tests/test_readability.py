"""Flesch readability: hand-computed counts, class boundaries via the
cross-multiplied integer comparisons, NULL/empty contracts, no shuffle."""

from evalidate_spark.functions.text import readability

SCHEMA = "doc_id long, text string"


def _by_id(spark, rows):
    out = readability(spark.createDataFrame(rows, SCHEMA))
    return {r.doc_id: r for r in out.collect()}


class TestReadability:
    def test_counts(self, spark):
        got = _by_id(spark, [
            (1, "The cat sat. The dog ran! Did it?"),
            (2, "no terminator here"),
            (3, None),
            (4, ""),
            (5, "..."),
        ])
        r = got[1]
        assert r.n_words == 8 and r.n_sentences == 3
        # vowel runs: e,a,a,e,o,a,i,i  ("the cat sat the dog ran did it")
        assert r.n_syllables == 8
        assert got[2].n_sentences == 1  # floored at 1
        assert got[3].n_words is None and got[3].reading_class is None
        assert got[4].n_words == 0 and got[4].reading_class is None
        assert got[4].n_sentences is None  # no words -> no sentence count
        # "..." is ONE nonempty space-split token: counted as a word with
        # zero syllables (the space-split contract, same as token_counts)
        assert got[5].n_words == 1 and got[5].n_syllables == 0
        assert got[5].reading_class == "easy"

    def test_class_matches_float_flesch(self, spark):
        rows = [
            (1, "The cat sat. The dog ran. It is fun."),  # short words: easy
            (2, "Incontrovertibly, multidimensional organizational "
                "prioritization necessitates irrefutable contextualization "
                "of institutionalization."),  # polysyllabic: very_difficult
        ]
        got = _by_id(spark, rows)

        def flesch(r):
            return (206.835 - 1.015 * r.n_words / r.n_sentences
                    - 84.6 * r.n_syllables / r.n_words)

        for r in got.values():
            f = flesch(r)
            want = ("easy" if f >= 70 else "standard" if f >= 50
                    else "difficult" if f >= 30 else "very_difficult")
            assert r.reading_class == want, (r, f)
        assert got[1].reading_class == "easy"
        assert got[2].reading_class == "very_difficult"

    def test_exact_boundary(self, spark):
        # craft W, S, Y landing exactly on FRE = 70: N == 70*D must be
        # classed 'easy' (inclusive threshold) with zero float rounding.
        # FRE = 206.835 - 1.015*W/S - 84.6*Y/W; pick W=8, S=2 ->
        # 206.835 - 4.06 - 10.575*Y = 70 -> Y = 12.55... not integer; use
        # the integer comparison directly instead: assert class flips
        # between adjacent Y values around each threshold.
        # W=4 S=1: FRE(Y) = 206.835 - 4.06 - 21.15*Y
        # Y=6 -> 75.9 easy; Y=7 -> 54.7 standard; Y=8 -> 33.6 difficult;
        # Y=9 -> 12.4 very_difficult
        def make(w, y):
            # "xa"*k is k separated vowel runs; spread y runs over w words
            parts = ["xa" * (y - (w - 1))] + ["xa"] * (w - 1)
            return " ".join(parts) + "."
        rows = [(y, make(4, y)) for y in range(6, 10)]
        got = _by_id(spark, rows)
        assert got[6].reading_class == "easy"
        assert got[7].reading_class == "standard"
        assert got[8].reading_class == "difficult"
        assert got[9].reading_class == "very_difficult"

    def test_projection_only_plan(self, spark):
        df = spark.createDataFrame([(1, "a b.")], SCHEMA)
        plan = readability(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
