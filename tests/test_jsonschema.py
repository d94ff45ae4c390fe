"""schema_to_rules: draft-07 JSON Schema → rule-spec importer. Mapping
matrix (types, unions, bounds, pattern, enum, format, arrays, nesting,
defaults, anyOf), unsupported-keyword refusals, and an end-to-end
engine run where schema-imported rules behave exactly like hand-built
ones."""

import pytest

from evalidate_spark import validate
from evalidate_spark.spec import (
    Allowed,
    Default,
    OrV,
    Regexp,
    Rule,
    Size,
    SpecError,
    Type,
)
from evalidate_spark.spec_json import rules_to_json, schema_to_rules


def one(prop, required=False):
    s = {
        "type": "object",
        "properties": {"p": prop},
        "required": ["p"] if required else [],
    }
    (rule,) = schema_to_rules(s)
    return rule


def test_scalar_mappings():
    r = one({"type": "string", "minLength": 2, "maxLength": 5}, required=True)
    assert r.presence == "required"
    assert r.validators == [Type("binary"), Size(2, 5)]
    r = one({"type": "integer", "minimum": 0, "maximum": 10})
    assert r.presence == "optional"
    assert r.validators == [Type("integer"), Size(0, 10)]
    assert one({"type": "number"}).validators == [Type("number")]
    assert one({"type": "boolean"}).validators == [Type("boolean")]
    assert one({"pattern": "^a+$"}).validators == [Regexp("^a+$")]
    assert one({"enum": ["x", "y"]}).validators == [Allowed(["x", "y"])]
    assert one({"const": 7}).validators == [Allowed([7])]


def test_type_union_drops_null():
    r = one({"type": ["string", "null"]})
    assert r.validators == [Type("binary")]
    r = one({"type": ["string", "integer"]})
    assert r.validators == [Type(["binary", "integer"])]


def test_default_becomes_optional_default():
    r = one({"type": "string", "default": "na"})
    assert r.presence == Default("na")


def test_array_mappings():
    r = one({"type": "array", "items": {"type": "string"}, "minItems": 1,
             "maxItems": 3, "uniqueItems": True})
    assert r.validators == [
        Type(("list", [Type("binary")])),
        Type("uniq_list"),
        Size(1, 3),
    ]
    # bare array: just the list type check
    assert one({"type": "array"}).validators == [Type("list")]


def test_nested_object_and_array_of_objects():
    r = one({"type": "object", "properties": {"k": {"type": "string"}},
             "required": ["k"]})
    assert len(r.childs) == 1 and r.childs[0].key == "k"
    assert r.childs[0].presence == "required"
    r = one({"type": "array",
             "items": {"type": "object",
                       "properties": {"k": {"type": "integer"}}}})
    assert len(r.childs) == 1 and r.childs[0].validators == [Type("integer")]


def test_anyof_single_validator_branches():
    r = one({"anyOf": [{"type": "string"}, {"type": "integer"}]})
    assert r.validators == [OrV([Type("binary"), Type("integer")])]
    with pytest.raises(SpecError):
        one({"anyOf": [{"type": "string", "minLength": 1, "maxLength": 2,
                        "pattern": "x"}]})


def test_format_mapping():
    (v,) = one({"type": "string", "format": "email"}).validators[1:]
    assert v.name == "v_email"
    with pytest.raises(SpecError):
        one({"format": "date-time"})


def test_required_without_property():
    s = {"type": "object", "properties": {}, "required": ["mystery"]}
    (r,) = schema_to_rules(s)
    assert r.key == "mystery" and r.presence == "required" and r.validators == []


@pytest.mark.parametrize(
    "bad",
    [
        {"type": "object", "properties": {"p": {"$ref": "#/defs/x"}}},
        {"type": "object", "properties": {"p": {"allOf": [{}]}}},
        {"type": "object", "properties": {"p": {"exclusiveMinimum": 3}}},
        {"type": "object", "properties": {"p": {"multipleOf": 2}}},
        {"type": "object", "properties": {"p": {"type": "array", "items": [{}]}}},
        {"type": "object", "properties": {"p": True}},
        {"type": "string"},
        {"type": "object", "properties": {"p": {"minLength": 1.5}}},
    ],
)
def test_unsupported_raises(bad):
    with pytest.raises(SpecError):
        schema_to_rules(bad)


def test_engine_equivalence(spark):
    """Schema-imported rules produce byte-identical violations to the
    hand-built equivalent spec on the same data."""
    schema = {
        "type": "object",
        "required": ["id", "name"],
        "properties": {
            "id": {"type": "integer", "minimum": 0},
            "name": {"type": "string", "minLength": 3},
            "kind": {"enum": ["a", "b"], "default": "a"},
        },
    }
    hand = [
        Rule(key="id", presence="required",
             validators=[Type("integer"), Size(0, None)]),
        Rule(key="name", presence="required",
             validators=[Type("binary"), Size(3, None)]),
        Rule(key="kind", presence=Default("a"), validators=[Allowed(["a", "b"])]),
    ]
    imported = schema_to_rules(schema)
    assert rules_to_json(imported) == rules_to_json(hand)
    df = spark.createDataFrame(
        [(1, "ok-name", "a"), (-1, "xy", "z"), (None, None, None)],
        "id long, name string, kind string",
    )
    got = validate(df, imported, id_cols=["id"])
    want = validate(df, hand, id_cols=["id"])

    def canon(df_):  # NULL-safe row ordering
        return sorted((repr(tuple(r)) for r in df_.collect()))

    assert canon(got.violations) == canon(want.violations)
    assert canon(got.clean) == canon(want.clean)
