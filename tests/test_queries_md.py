"""Lockstep meta-test: QUERIES.md (the generated one-page index of the
driver-contract surface) must match the live ``queries()`` /
``oracle_sql()`` registries — names, order, and oracle kind.  Bench
seconds are generation-time data and are NOT part of the contract.
Regenerate with ``python scripts/gen_queries_md.py``."""

import os
import re

import __spark_entry__ as entry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ROW = re.compile(r"^\| (\d+)( \\\*)? \| `([a-z0-9_]+)` \| (sql|rows-only) \|")


def _parse_md():
    rows = []
    with open(os.path.join(_REPO, "QUERIES.md")) as f:
        for line in f:
            m = _ROW.match(line)
            if m:
                rows.append(
                    (int(m.group(1)), m.group(3), m.group(4), bool(m.group(2)))
                )
    return rows


def test_queries_md_in_lockstep():
    md = _parse_md()
    qs = list(entry.queries())
    oracles = entry.oracle_sql()
    assert [n for _, n, _, _ in md] == qs, (
        "QUERIES.md is stale — run `python scripts/gen_queries_md.py`"
    )
    assert [p for p, _, _, _ in md] == list(range(1, len(qs) + 1))
    # the \* marker must flag exactly the driver window (positions 1-50)
    assert [w for p, _, _, w in md] == [p <= 50 for p, _, _, _ in md], (
        "QUERIES.md window markers out of lockstep — regenerate"
    )
    for _, name, kind, _ in md:
        want = "sql" if name in oracles else "rows-only"
        assert kind == want, (
            f"{name}: QUERIES.md says {kind}, registry says {want} — "
            "run `python scripts/gen_queries_md.py`"
        )


def test_queries_md_headline_counts():
    txt = open(os.path.join(_REPO, "QUERIES.md")).read()
    n = len(entry.queries())
    n_sql = len(entry.oracle_sql())
    assert f"{n} queries, {n_sql} with a DuckDB hash oracle" in txt, (
        "QUERIES.md headline counts are stale — run "
        "`python scripts/gen_queries_md.py`"
    )
