"""Mechanized driver-canonicalizer contract (the round-2/3/4 lesson,
three incidents deep): the driver's correctness gate canonicalizes rows
with pandas ``sort_values`` + per-engine rendering, so a query is
driver-certifiable ONLY if every emitted column is scalar, every
integer (and decimal) fits int64, and every float is finite.  Each rule
was learned from a real red driver row:

- round 2 ``sessions``: int64 cast divergence;
- round 3 ``column_fingerprints``: a >int64 numeric rendered
  HUGEINT-full-digits in DuckDB vs "%.6g" elsewhere;
- round 4 ``centroid_states``: an ``array<bigint>`` column made pandas
  ``sort_values`` raise ``unhashable type: 'list'`` — the row became
  ``err`` with no verdict at all, while the local str()-based gate
  stayed green.

These tests enforce the contract mechanically so local green can never
again contradict a driver err: schema-level over the ENTIRE ``queries()``
surface (no job runs — Catalyst analysis only), value-level over the
driver's 50-query window (full collect at sf0.001).
``scripts/check_entry.py`` enforces the same rules fail-closed at
sf0.01 (its ``NonScalarCell``)."""

import math
import os

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# Types the driver's pandas canonicalizer can sort and both engines
# render identically.  Array/Map/Struct are unhashable in pandas
# (sort_values dies); Binary renders engine-divergently; Decimal is
# allowed only when its precision guarantees int64-range magnitudes
# (precision ≤ 18 < 19 digits of 2^63).
_SCALAR_OK = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)

_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _schema_violations(name, schema):
    bad = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.DecimalType):
            if dt.precision > 18:
                bad.append(f"{name}.{f.name}: {dt.simpleString()} can "
                           "exceed int64 — cast to bigint (centi/milli "
                           "units) or decimal(18,s)")
            continue
        if not isinstance(dt, _SCALAR_OK):
            bad.append(f"{name}.{f.name}: non-scalar {dt.simpleString()}")
    return bad


@pytest.fixture(scope="module")
def surface(spark):
    return {n: fn(spark, SF) for n, fn in entry.queries().items()}


def test_every_query_schema_is_driver_certifiable(surface):
    """No array/map/struct/binary column and no >int64-capable numeric
    type anywhere on the driver surface — window membership rotates, so
    the schema rule holds for ALL 200+ queries, not just today's 50."""
    bad = []
    for name, df in surface.items():
        bad += _schema_violations(name, df.schema)
    assert not bad, "driver-uncertifiable columns:\n" + "\n".join(bad)


def test_window_values_are_driver_certifiable(surface):
    """Value-level check over the driver's actual window (first 50
    ``queries()`` entries, the rows CORRECTNESS_r{N}.json certifies):
    every collected cell must be scalar, integers/decimals within
    int64, floats finite.  Catches what schema can't: a long column
    whose VALUES overflow (the column_fingerprints incident) or a NaN
    that renders engine-divergently."""
    names = list(surface)[:50]
    bad = []
    for name in names:
        for row in surface[name].collect():
            for col, v in zip(surface[name].columns, row):
                if v is None or isinstance(v, (str, bool)):
                    continue
                if isinstance(v, float):
                    if not math.isfinite(v):
                        bad.append(f"{name}.{col}: non-finite float {v!r}")
                elif isinstance(v, int):
                    if not _I64_MIN <= v <= _I64_MAX:
                        bad.append(f"{name}.{col}: int out of int64 {v}")
                elif isinstance(v, (list, tuple, dict, set, bytes, bytearray)):
                    bad.append(
                        f"{name}.{col}: non-scalar cell {type(v).__name__}"
                    )
            if bad:
                break  # one offending row per query is enough to report
    assert not bad, "driver-uncertifiable cells:\n" + "\n".join(bad)


def test_window_contains_former_reds():
    """The r3 `sessions` lesson: a red driver row must stay in the
    window until the DRIVER (not the local gate) certifies the fix.
    Every query that has ever been red in a CORRECTNESS_r{N}.json stays
    pinned in positions 1-50 until a later round's driver file shows it
    green."""
    former_reds = {"sessions", "column_fingerprints", "centroid_states"}
    window = set(list(entry.queries())[:50])
    missing = former_reds - window
    assert not missing, (
        f"former driver-red queries rotated out of the window: {missing}"
    )
