"""Property-based pin for the JSON-Schema importer: hypothesis generates
random draft-07-subset object schemas plus conforming AND violating
typed rows, and the engine verdict for ``schema_to_rules(schema)`` must
equal an independent pure-Python draft-07 evaluator on every row.

This complements the 17-case mapping matrix in test_jsonschema.py: the
matrix pins each keyword's translation, the property test pins the
SEMANTICS of arbitrary keyword combinations (required × default ×
bounds × pattern × enum × array constraints × one level of nesting)
against a second implementation that shares no code with the importer
or the compiler.  Engine semantics mirrored by the evaluator: NULL
value ≡ missing key (presence layer owns NULLs); ``default`` satisfies
presence; bounds are inclusive; patterns are unanchored contains-
matches."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from evalidate_spark import validate
from evalidate_spark.spec_json import schema_to_rules

# ---------------------------------------------------------- schema strategy

_NAMES = ["p0", "p1", "p2"]
_PATTERNS = ["a", "^a", "b$", "ab"]


@st.composite
def string_schema(draw, force_bounds=False):
    s = {"type": "string"}
    if force_bounds or draw(st.booleans()):
        s["minLength"] = draw(st.integers(0, 3))
    if force_bounds or draw(st.booleans()):
        s["maxLength"] = draw(st.integers(3, 8))
    extra = draw(st.sampled_from(["none", "pattern", "enum"]))
    if extra == "pattern":
        s["pattern"] = draw(st.sampled_from(_PATTERNS))
    elif extra == "enum":
        s["enum"] = draw(
            st.lists(st.sampled_from(["a", "ab", "abb", "b"]), min_size=1,
                     max_size=3, unique=True)
        )
    return s


@st.composite
def integer_schema(draw, force_bounds=False):
    s = {"type": "integer"}
    if force_bounds or draw(st.booleans()):
        s["minimum"] = draw(st.integers(-10, 0))
    if force_bounds or draw(st.booleans()):
        s["maximum"] = draw(st.integers(0, 10))
    return s


@st.composite
def array_schema(draw, force_bounds=False):
    s = {"type": "array", "items": {"type": "string"}}
    if force_bounds or draw(st.booleans()):
        s["minItems"] = draw(st.integers(0, 2))
    if force_bounds or draw(st.booleans()):
        s["maxItems"] = draw(st.integers(2, 4))
    if force_bounds or draw(st.booleans()):
        s["uniqueItems"] = True
    return s


def scalar_schema():
    return st.one_of(
        string_schema(), integer_schema(), st.just({"type": "boolean"})
    )


@st.composite
def anyof_schema(draw):
    """``anyOf`` with single-validator string-shaped branches (the
    importer's supported subset → validator-level OrV): a value passes
    iff ANY branch's constraint passes."""
    branches = []
    n = draw(st.integers(2, 3))
    for _ in range(n):
        kind = draw(st.sampled_from(["minlen", "pattern", "enum"]))
        if kind == "minlen":
            branches.append({"minLength": draw(st.integers(1, 4))})
        elif kind == "pattern":
            branches.append({"pattern": draw(st.sampled_from(_PATTERNS))})
        else:
            branches.append(
                {"enum": draw(st.lists(st.sampled_from(["a", "ab", "b"]),
                                       min_size=1, max_size=2, unique=True))}
            )
    return {"anyOf": branches}


@st.composite
def object_schema(draw, nested=True, focus=None):
    """*focus* forces property ``p0`` to the given kind WITH its bound
    keywords present — without it, a 15-example run can easily sample
    zero schemas exercising a particular keyword, and an off-by-one in
    either implementation slips through (found by mutation-testing this
    very test)."""
    names = draw(
        st.lists(st.sampled_from(_NAMES), min_size=1, max_size=3, unique=True)
    )
    if focus is not None and "p0" not in names:
        names.append("p0")
    props = {}
    for n in names:
        if n == "p0" and focus == "string":
            props[n] = draw(string_schema(force_bounds=True))
            continue
        if n == "p0" and focus == "integer":
            props[n] = draw(integer_schema(force_bounds=True))
            continue
        if n == "p0" and focus == "array":
            props[n] = draw(array_schema(force_bounds=True))
            continue
        if n == "p0" and focus == "object":
            props[n] = draw(object_schema(nested=False, focus=None))
            continue
        if n == "p0" and focus == "anyof":
            props[n] = draw(anyof_schema())
            continue
        kinds = ["scalar", "array"] + (["object"] if nested else [])
        kind = draw(st.sampled_from(kinds))
        if kind == "scalar":
            props[n] = draw(scalar_schema())
        elif kind == "array":
            props[n] = draw(array_schema())
        else:
            props[n] = draw(object_schema(nested=False))
    required = [n for n in names if draw(st.booleans())]
    # defaults only on optional string props, always satisfying the
    # constraints is NOT guaranteed — the evaluator treats a filled
    # default as presence-satisfying (engine contract), so any value ok
    for n in names:
        if n not in required and props[n].get("type") == "string" and draw(
            st.booleans()
        ):
            props[n] = dict(props[n], default="ab")
    return {"type": "object", "properties": props, "required": required}


# ------------------------------------------------------------ row strategy


def _value_for(sub):
    """Boundary-biased: half the draws land exactly ON a declared bound
    (length == minLength, value == maximum, len == maxItems …) so
    off-by-one strictness bugs in either implementation can't hide."""
    if "anyOf" in sub:
        bounds = [
            b + d
            for br in sub["anyOf"]
            if "minLength" in br
            for d in (-1, 0, 1)
            for b in (br["minLength"],)
            if b + d >= 0
        ]
        on_bound = (
            st.sampled_from(bounds).map(lambda k: "a" * k)
            if bounds else st.just("a")
        )
        return st.one_of(
            st.none(), st.text(alphabet="ab", max_size=6), on_bound
        )
    t = sub.get("type")
    if t == "string":
        bounds = [
            b + d
            for b in (sub.get("minLength"), sub.get("maxLength"))
            if b is not None
            for d in (-1, 0, 1)
            if b + d >= 0
        ]
        on_bound = (
            st.sampled_from(bounds).map(lambda k: "a" * k)
            if bounds
            else st.just("a")
        )
        return st.one_of(
            st.none(), st.text(alphabet="ab", max_size=6), on_bound
        )
    if t == "integer":
        bounds = [
            b + d
            for b in (sub.get("minimum"), sub.get("maximum"))
            if b is not None
            for d in (-1, 0, 1)
        ]
        on_bound = st.sampled_from(bounds) if bounds else st.just(0)
        return st.one_of(st.none(), st.integers(-15, 15), on_bound)
    if t == "boolean":
        return st.one_of(st.none(), st.booleans())
    if t == "array":
        bounds = [
            b + d
            for b in (sub.get("minItems"), sub.get("maxItems"))
            if b is not None
            for d in (-1, 0, 1)
            if b + d >= 0
        ]
        on_bound = (
            st.sampled_from(bounds).map(lambda k: ["a%d" % i for i in range(k)])
            if bounds
            else st.just([])
        )
        return st.one_of(
            st.none(),
            st.lists(st.text(alphabet="ab", min_size=1, max_size=2), max_size=4),
            on_bound,
        )
    if t == "object":
        return st.one_of(st.none(), row_for(sub))
    raise AssertionError(t)


@st.composite
def row_for(draw, schema):
    return {
        n: draw(_value_for(sub))
        for n, sub in schema.get("properties", {}).items()
    }


def _spark_type(sub):
    if "anyOf" in sub:
        return T.StringType()
    t = sub.get("type")
    if t == "string":
        return T.StringType()
    if t == "integer":
        return T.LongType()
    if t == "boolean":
        return T.BooleanType()
    if t == "array":
        return T.ArrayType(T.StringType())
    if t == "object":
        return T.StructType(
            [
                T.StructField(n, _spark_type(s))
                for n, s in sub.get("properties", {}).items()
            ]
        )
    raise AssertionError(t)


# --------------------------------------------------- pure-Python evaluator


def _scalar_ok(sub, v) -> bool:
    if "anyOf" in sub:
        return any(
            _scalar_ok(dict(br, type="string"), v) for br in sub["anyOf"]
        )
    t = sub.get("type")
    if t == "string":
        ln = len(v)
        if "minLength" in sub and ln < sub["minLength"]:
            return False
        if "maxLength" in sub and ln > sub["maxLength"]:
            return False
        if "pattern" in sub and not re.search(sub["pattern"], v):
            return False
        if "enum" in sub and v not in sub["enum"]:
            return False
        return True
    if t == "integer":
        if "minimum" in sub and v < sub["minimum"]:
            return False
        if "maximum" in sub and v > sub["maximum"]:
            return False
        return True
    if t == "boolean":
        return True
    if t == "array":
        if "minItems" in sub and len(v) < sub["minItems"]:
            return False
        if "maxItems" in sub and len(v) > sub["maxItems"]:
            return False
        if sub.get("uniqueItems") and len(set(v)) != len(v):
            return False
        return True
    raise AssertionError(t)


def eval_ok(schema, row) -> bool:
    """Independent draft-07-subset evaluator under the ENGINE's presence
    contract: NULL ≡ missing; required-and-no-default missing → fail;
    default fills presence; validators run only on present values."""
    props = schema.get("properties", {})
    required = schema.get("required", [])
    for name in props:
        sub = props[name]
        v = row.get(name) if row is not None else None
        if v is None:
            if name in required and "default" not in sub:
                return False
            continue
        if sub.get("type") == "object":
            if not eval_ok(sub, v.asDict() if hasattr(v, "asDict") else v):
                return False
        elif not _scalar_ok(sub, v):
            return False
    return True


# ------------------------------------------------------------------- test


import pytest


@pytest.mark.parametrize("focus", ["string", "integer", "array", "object", "anyof"])
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_imported_schema_verdicts_match_pure_evaluator(spark, focus, data):
    schema = data.draw(object_schema(focus=focus))
    rows = data.draw(st.lists(row_for(schema), min_size=1, max_size=6))

    fields = [T.StructField("__id", T.LongType())] + [
        T.StructField(n, _spark_type(sub))
        for n, sub in schema["properties"].items()
    ]
    sdf = spark.createDataFrame(
        [
            {"__id": i, **{
                n: (tuple(r[n].values()) if isinstance(r.get(n), dict) else r.get(n))
                for n in schema["properties"]
            }}
            for i, r in enumerate(rows)
        ],
        T.StructType(fields),
    )
    rules = schema_to_rules(schema)
    res = validate(sdf, rules, id_cols=["__id"])
    failed = {r["__id"] for r in res.violations.select("__id").distinct().collect()}
    for i, row in enumerate(rows):
        want_ok = eval_ok(schema, row)
        got_ok = i not in failed
        assert got_ok == want_ok, (
            f"row {i}: engine={'pass' if got_ok else 'fail'} "
            f"evaluator={'pass' if want_ok else 'fail'}\n"
            f"schema={schema}\nrow={row}"
        )
