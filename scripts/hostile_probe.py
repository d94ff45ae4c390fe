"""Row-level diff aid for tests/test_hostile_parity.py failures: build
the SAME hostile tables (shared fixture in evalidate_spark.fixtures) and
print, per query named on the CLI, OK or the canonicalised row multiset
diff between the Spark query and its DuckDB oracle — identical
column-sorted %.6g canonicalisation to the gate, so a probe OK implies
a gate pass.  Usage: python scripts/hostile_probe.py q1 [q2 ...]"""

import os
import sys
import tempfile
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from evalidate_spark.fixtures import write_hostile_tables  # noqa: E402
from evalidate_spark.session import get_spark  # noqa: E402


def _lines(cols, rows):
    from evalidate_spark.fixtures import canon_lines

    return Counter(canon_lines(cols, rows))


def main() -> None:
    spark = get_spark(cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = write_hostile_tables(spark, tempfile.mkdtemp())
    con = duckdb.connect()
    for t in ("documents", "events", "lineitem", "supplier", "embeddings",
              "part", "nation", "region", "orders"):
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet/*.parquet'" % (t, tmp, t)
        )
    qs, osql = e.queries(), e.oracle_sql()
    for name in sys.argv[1:]:
        sdf = qs[name](spark, tmp)
        s = _lines(sdf.columns, [tuple(r) for r in sdf.collect()])
        ores = con.execute(osql[name]).fetchall()
        o = _lines([d[0] for d in con.description], ores)
        if s == o:
            print(name, "OK (%d rows)" % sum(s.values()))
            continue
        print("==", name, "cols(sorted):", sorted(sdf.columns))
        for ln, cnt in (s - o).items():
            print(" spark-only  x%d:" % cnt, ln)
        for ln, cnt in (o - s).items():
            print(" oracle-only x%d:" % cnt, ln)


if __name__ == "__main__":
    main()
