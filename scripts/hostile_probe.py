"""Ad-hoc hostile-corpus oracle diff: build the adversarial documents +
events tables in a temp dir, then for each query name on the CLI print
OK or the row-level Spark↔DuckDB diff.  Development aid for extending
oracles to full NULL semantics (tests/test_hostile_parity.py is the
pinned gate).  Usage: python scripts/hostile_probe.py q1 [q2 ...]"""

import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from evalidate_spark.session import get_spark  # noqa: E402

DOCS = [
    (1, None, "en", "src1", 0),
    (2, None, "en", "src2", 0),
    (3, "", "es", "src3", 0),
    (4, "a  b   c", "en", "src4", 8),
    (5, "x y z x y z", "es", "src5", 11),
    (6, "x y z x y z", "zz", "bad!", 11),
    (7, "the the the the", None, "src7", None),
    (None, "orphan text row here", "de", "src8", 20),
    (8, "solo", "de", None, 4),
]
EVENTS = [
    (1, "2026-01-01 10:00:00", 1, "view", 1.5, None),
    (2, "2026-01-01 10:05:00", 1, "view", None, None),
    (3, "2026-01-01 11:00:00", 1, "buy", 2.5, None),
    (4, "2026-01-01 10:00:00", None, "view", 3.0, None),
    (5, None, 2, "view", 4.0, None),
    (6, "2026-01-01 10:30:00", 2, None, 0.0, None),
    (None, "2026-01-01 12:00:00", 3, "view", -1.0, None),
]


LINEITEM = [
    # (l_orderkey, l_linenumber, l_suppkey, l_quantity, l_returnflag, l_shipdate_s)
    (1, 1, 2, 10.0, "N", "2026-01-05"),
    (1, 2, 4, 20.0, "R", "2026-01-06"),
    (2, 1, 3, None, "A", None),          # NULL quantity + shipdate
    (2, 2, None, 30.0, None, "2026-01-07"),  # NULL suppkey + returnflag
    (None, 1, 6, 40.0, "N", "2026-01-08"),   # NULL orderkey
    (3, None, 99, 50.0, "R", "2026-01-09"),  # NULL linenumber, dangling supp
]
SUPPLIER = [(2, "s2"), (4, "s4"), (6, "s6"), (None, "snull")]


def main() -> None:
    spark = get_spark(cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    spark.createDataFrame(
        EVENTS,
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    spark.createDataFrame(
        LINEITEM,
        "l_orderkey long, l_linenumber int, l_suppkey long, l_quantity double, "
        "l_returnflag string, l_shipdate_s string",
    ).selectExpr(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity", "l_returnflag",
        "cast(l_shipdate_s as date) l_shipdate",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "lineitem.parquet"))
    spark.createDataFrame(SUPPLIER, "s_suppkey long, s_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(tmp, "supplier.parquet"))
    con = duckdb.connect()
    for t in ("documents", "events", "lineitem", "supplier"):
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet/*.parquet'" % (t, tmp, t)
        )
    qs, osql = e.queries(), e.oracle_sql()
    for name in sys.argv[1:]:
        sdf = qs[name](spark, tmp)
        s = sorted(tuple(str(v) for v in r) for r in sdf.collect())
        o = sorted(
            tuple(str(v) for v in r) for r in con.execute(osql[name]).fetchall()
        )
        if s == o:
            print(name, "OK (%d rows)" % len(s))
            continue
        print("==", name, sdf.columns)
        for a in s:
            if a not in o:
                print(" spark-only :", a)
        for b in o:
            if b not in s:
                print(" oracle-only:", b)


if __name__ == "__main__":
    main()
