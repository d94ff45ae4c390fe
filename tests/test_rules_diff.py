"""rules_diff / schema_compat: spec diffing and contract-evolution
impact classification, including the JSON-Schema-to-JSON-Schema path."""

import pytest

from evalidate_spark.spec import (
    Allowed,
    Regexp,
    Rule,
    RuleOr,
    Size,
    SpecError,
    Type,
)
from evalidate_spark.spec_json import rules_diff, schema_compat, schema_to_rules


def impacts(old, new):
    return {d["key"]: (d["change"], d["impact"]) for d in schema_compat(old, new)}


def test_diff_add_remove_change():
    old = [Rule(key="a", validators=[Type("binary")]),
           Rule(key="b", presence="optional")]
    new = [Rule(key="a", validators=[Type("binary"), Size(1, 5)]),
           Rule(key="c", presence="optional")]
    d = {x["key"]: x["change"] for x in rules_diff(old, new)}
    assert d == {"a": "changed", "b": "removed", "c": "added"}
    # identical specs diff empty
    assert rules_diff(old, old) == []


def test_multikey_expansion_and_duplicates():
    old = [Rule(key=["x", "y"], presence="optional")]
    new = [Rule(key="x", presence="optional")]
    d = {x["key"]: x["change"] for x in rules_diff(old, new)}
    assert d == {"y": "removed"}
    with pytest.raises(SpecError):
        rules_diff([Rule(key="x"), Rule(key="x")], [])


def test_presence_impacts():
    base = [Rule(key="k", presence="optional")]
    tightened = [Rule(key="k", presence="required")]
    assert impacts(base, tightened)["k"] == ("changed", "breaking")
    assert impacts(tightened, base)["k"] == ("changed", "relaxed")


def test_added_removed_impacts():
    assert impacts([], [Rule(key="k", presence="required")])["k"] == (
        "added", "breaking")
    assert impacts([], [Rule(key="k", presence="optional")])["k"] == (
        "added", "compatible")
    assert impacts([Rule(key="k")], [])["k"] == ("removed", "relaxed")


def test_size_and_allowed_impacts():
    def sz(lo, hi):
        return [Rule(key="k", presence="optional", validators=[Size(lo, hi)])]

    assert impacts(sz(1, 10), sz(2, 10))["k"][1] == "breaking"
    assert impacts(sz(1, 10), sz(1, 20))["k"][1] == "relaxed"
    assert impacts(sz(1, 10), sz(2, 20))["k"][1] == "review"
    # open bounds: None = infinity
    assert impacts(sz(1, None), sz(1, 100))["k"][1] == "breaking"

    def al(*vs):
        return [Rule(key="k", presence="optional", validators=[Allowed(list(vs))])]

    assert impacts(al("a", "b"), al("a"))["k"][1] == "breaking"
    assert impacts(al("a"), al("a", "b"))["k"][1] == "relaxed"
    assert impacts(al("a", "b"), al("a", "c"))["k"][1] == "review"


def test_review_cases():
    old = [Rule(key="k", presence="optional", validators=[Regexp("^a$")])]
    new = [Rule(key="k", presence="optional", validators=[Regexp("^b$")])]
    assert impacts(old, new)["k"][1] == "review"
    # pure validator removal relaxes
    both = [Rule(key="k", presence="optional",
                 validators=[Regexp("^a$"), Size(1, 2)])]
    one = [Rule(key="k", presence="optional", validators=[Regexp("^a$")])]
    assert impacts(both, one)["k"][1] == "relaxed"
    assert impacts(one, both)["k"][1] == "breaking"
    # combinators are opaque
    o = [RuleOr(rules=[Rule(key="k", presence="optional")])]
    n = [RuleOr(rules=[Rule(key="k")])]
    assert impacts(o, n)["<or:0>"][1] == "review"


def test_message_only_change_is_compatible():
    old = [Rule(key="k", presence="optional", on_error="old msg")]
    new = [Rule(key="k", presence="optional", on_error="new msg")]
    assert impacts(old, new)["k"] == ("changed", "compatible")


def test_jsonschema_contract_bump():
    v1 = {"type": "object", "required": ["id"],
          "properties": {"id": {"type": "integer"},
                         "tag": {"enum": ["a", "b", "c"]}}}
    v2 = {"type": "object", "required": ["id", "tag"],
          "properties": {"id": {"type": "integer"},
                         "tag": {"enum": ["a", "b"]}}}
    got = impacts(schema_to_rules(v1), schema_to_rules(v2))
    # tag became required AND narrowed its enum -> presence wins (breaking)
    assert got["tag"] == ("changed", "breaking")
    assert "id" not in got
