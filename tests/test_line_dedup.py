"""line_dedup: C4-style corpus line dedup with rewrite. Boilerplate
drop, within-doc duplicates, empty-line structure, NULL contracts,
NULL-id collapse, threshold, delimiter."""

import pytest

from evalidate_spark.functions import dedup

SCHEMA = "doc_id long, text string"


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r.doc_id: (r.n_lines, r.n_kept, r.n_dropped, r.text_clean)
        for r in dedup.line_dedup(df, **kw).collect()
    }


def test_boilerplate_dropped_everywhere(spark):
    got = run(
        spark,
        [
            (1, "unique one\nBOILER\nunique two"),
            (2, "BOILER\nother text"),
            (3, "solo\n\nBOILER"),
            (4, None),
            (5, ""),
            (6, "x\nx"),
        ],
    )
    assert got[1] == (3, 2, 1, "unique one\nunique two")
    assert got[2] == (2, 1, 1, "other text")
    # the empty line is STRUCTURE: kept, never counted as boilerplate
    assert got[3] == (3, 2, 1, "solo\n")
    assert 4 not in got                       # NULL text excluded
    assert got[5] == (1, 1, 0, "")            # empty text = one empty line
    assert got[6] == (2, 0, 2, "")            # within-doc dup counts


def test_threshold(spark):
    rows = [(1, "a\nb"), (2, "a\nc"), (3, "a\nd")]
    got3 = run(spark, rows, min_occurrences=3)
    assert got3[1] == (2, 1, 1, "b")          # 'a' occurs 3x -> dropped
    got4 = run(spark, rows, min_occurrences=4)
    assert got4[1] == (2, 2, 0, "a\nb")       # below threshold -> kept
    with pytest.raises(ValueError):
        run(spark, rows, min_occurrences=1)


def test_null_id_collapse(spark):
    # NULL-id docs collapse into one group (SQL GROUP BY semantics);
    # their lines merge in (pos, line) order
    got = run(spark, [(None, "zz"), (None, "aa"), (7, "qq")])
    assert got[7] == (1, 1, 0, "qq")
    assert got[None] == (2, 2, 0, "aa\nzz")   # pos 0 ties -> line asc


def test_custom_delimiter(spark):
    got = run(spark, [(1, "a|B|c"), (2, "B|d")], delim="|")
    assert got[1] == (3, 2, 1, "a|c")
    assert got[2] == (2, 1, 1, "d")
