"""script_profile: Unicode script-mix / homoglyph signal. Hand-counted
multi-script rows, the Cyrillic-homoglyph spam case, NULL/empty
contracts, and the projection-only plan shape."""

from evalidate_spark.functions import text

SCHEMA = "doc_id long, text string"


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.doc_id: r for r in text.script_profile(df).collect()}


def test_script_counts(spark):
    got = run(
        spark,
        [
            (0, "hello world 123"),   # pure Latin; digits count nowhere
            (1, "hеllo wоrld"),  # Cyrillic е/о homoglyphs
            (2, "αβγ abc 中文"),  # greek+latin+han
            (3, "مرحبا"),       # arabic
            (4, "café naïve"),  # Latin-1 letters are Latin
        ],
    )
    r0 = got[0]
    assert (r0.latin_n, r0.n_scripts, r0.mixed) == (10, 1, False)
    r1 = got[1]
    assert (r1.latin_n, r1.cyrillic_n, r1.mixed) == (8, 2, True)
    r2 = got[2]
    assert (r2.greek_n, r2.latin_n, r2.cjk_n, r2.n_scripts) == (3, 3, 2, 3)
    assert got[3].arabic_n == 5 and got[3].mixed is False
    assert got[4].latin_n == 9 and got[4].n_scripts == 1


def test_contracts(spark):
    got = run(spark, [(0, None), (1, ""), (2, "12 !? .")])
    r0 = got[0]
    assert r0.latin_n is None and r0.cyrillic_n is None
    # NULL text participates in no script: n_scripts 0, not NULL (the
    # count columns carry the NULL contract; the flags stay total)
    assert r0.n_scripts == 0 and r0.mixed is False
    assert got[1].latin_n == 0 and got[1].n_scripts == 0
    assert got[2].latin_n == 0 and got[2].n_scripts == 0


def test_projection_only_plan(spark):
    df = spark.createDataFrame([(0, "a")], SCHEMA)
    plan = (
        text.script_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Generate" not in plan


def test_lang_agreement(spark):
    """Confusion counts: declared label vs marker-hit argmax, including
    und (no hits), NULL text, and the null-safe agree flag."""
    rows = [
        (0, "the cat and the dog", "en"),    # en guess, en label
        (1, "the cat and the dog", "es"),    # en guess, es label -> disagree
        (2, "el perro y la casa de", "es"),  # es guess
        (3, "zz qq xx", "en"),               # no markers -> und
        (4, None, None),                     # NULL text -> NULL guess; agree
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r.lang, r.lang_guess): (r.n, r.agree)
        for r in text.lang_agreement(df).collect()
    }
    assert got == {
        ("en", "en"): (1, True),
        ("es", "en"): (1, False),
        ("es", "es"): (1, True),
        ("en", "und"): (1, False),
        (None, None): (1, True),
    }
