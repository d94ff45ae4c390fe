"""Rule-spec ⇄ JSON serialization.

The spec is *data* (SURVEY.md §7); serializing it gives three things the
north rule asks for: lineage (the exact rule-set a run used is recorded
next to its manifest), `spark-submit` jobs parameterised by a rules file,
and spec diffing across runs.

Declarative nodes round-trip exactly.  Library validators
(:mod:`evalidate_spark.lib`) round-trip by registry name + recorded
constructor params.  ``CustomValidator`` / ``CustomConverter`` carry
Python callables and are rejected with a clear error — register a named
library validator instead when the spec must be serialized.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, List

from . import lib
from .spec import (
    Allowed,
    CustomConverter,
    CustomValidator,
    Default,
    Each,
    EqualToObjectOfOtherKeys,
    Native,
    OrV,
    Regexp,
    Rule,
    RuleAnd,
    RuleOr,
    Size,
    SpecError,
    Type,
    normalize_rules,
)

LIB_REGISTRY: Dict[str, Callable[..., Native]] = {
    "v_binary_integer": lib.v_binary_integer,
    "v_binary_numeric": lib.v_binary_numeric,
    "v_binary_boolean": lib.v_binary_boolean,
    "v_url": lib.v_url,
    "v_email": lib.v_email,
    "v_uuid_v4": lib.v_uuid_v4,
    "v_uuid_v1": lib.v_uuid_v1,
    "v_password": lib.v_password,
    "elements_in": lib.elements_in,
    "v_array": lib.v_array,
    "v_object": lib.v_object,
    "v_utf8": lib.v_utf8,
    "v_unicode_null": lib.v_unicode_null,
}


def _validator_to_dict(v: Any) -> Dict[str, Any]:
    if isinstance(v, Type):
        of = v.of
        if isinstance(of, tuple) and len(of) == 2 and of[0] == "list":
            return {"kind": "type", "of": {"list_of": [_validator_to_dict(x) for x in of[1]]}}
        return {"kind": "type", "of": list(of) if isinstance(of, (list, tuple)) else of}
    if isinstance(v, Size):
        return {"kind": "size", "min": v.min, "max": v.max}
    if isinstance(v, Regexp):
        return {"kind": "regexp", "pattern": v.pattern}
    if isinstance(v, Allowed):
        return {"kind": "allowed", "values": list(v.values)}
    if isinstance(v, OrV):
        return {"kind": "or", "alternatives": [_validator_to_dict(a) for a in v.alternatives]}
    if isinstance(v, EqualToObjectOfOtherKeys):
        return {"kind": "equal_to_object_of_other_keys", "keys": list(v.keys)}
    if isinstance(v, Native):
        if v.name not in LIB_REGISTRY:
            raise SpecError("Native validator '%s' is not in the serializable registry" % v.name)
        return {"kind": "lib", "name": v.name, "params": list(v.params)}
    if isinstance(v, CustomValidator):
        raise SpecError(
            "CustomValidator (fn=%r) cannot be serialized — register a named "
            "library validator instead" % getattr(v.fn, "__name__", v.fn)
        )
    raise SpecError("Unknown validator '%r'" % (v,))


def _validator_from_dict(d: Dict[str, Any]) -> Any:
    kind = d.get("kind")
    if kind == "type":
        of = d["of"]
        if isinstance(of, dict) and "list_of" in of:
            return Type(("list", [_validator_from_dict(x) for x in of["list_of"]]))
        return Type(of)
    if kind == "size":
        return Size(d["min"], d["max"])
    if kind == "regexp":
        return Regexp(d["pattern"])
    if kind == "allowed":
        return Allowed(d["values"])
    if kind == "or":
        return OrV([_validator_from_dict(a) for a in d["alternatives"]])
    if kind == "equal_to_object_of_other_keys":
        return EqualToObjectOfOtherKeys(d["keys"])
    if kind == "lib":
        name = d["name"]
        if name not in LIB_REGISTRY:
            raise SpecError("Unknown library validator '%s'" % name)
        return LIB_REGISTRY[name](*d.get("params", []))
    raise SpecError("Unknown validator kind '%r'" % (kind,))


def _converter_to_dict(c: Any) -> Any:
    if c is None:
        return None
    if isinstance(c, str):
        return c
    if isinstance(c, Each):
        return {"kind": "each", "conv": _converter_to_dict(c.conv)}
    if isinstance(c, CustomConverter):
        raise SpecError(
            "CustomConverter (fn=%r) cannot be serialized" % getattr(c.fn, "__name__", c.fn)
        )
    raise SpecError("Wrong converter")


def _converter_from_dict(d: Any) -> Any:
    if d is None or isinstance(d, str):
        return d
    if isinstance(d, dict) and d.get("kind") == "each":
        return Each(_converter_from_dict(d["conv"]))
    raise SpecError("Wrong converter")


def _presence_to_dict(p: Any) -> Any:
    if isinstance(p, Default):
        return {"kind": "default", "value": p.value}
    return p


def _presence_from_dict(d: Any) -> Any:
    if isinstance(d, dict) and d.get("kind") == "default":
        return Default(d["value"])
    return d


def node_to_dict(node: Any) -> Dict[str, Any]:
    if isinstance(node, Rule):
        return {
            "kind": "rule",
            "key": list(node.key) if isinstance(node.key, (list, tuple)) else node.key,
            "presence": _presence_to_dict(node.presence),
            "validators": [_validator_to_dict(v) for v in (node.validators or ())],
            "converter": _converter_to_dict(node.converter),
            "childs": [node_to_dict(c) for c in (node.childs or ())],
            "on_error": node.on_error,
        }
    if isinstance(node, RuleAnd):
        return {
            "kind": "rule_and",
            "rules": [node_to_dict(r) for r in node.rules],
            "on_error": node.on_error,
        }
    if isinstance(node, RuleOr):
        return {
            "kind": "rule_or",
            "rules": [node_to_dict(r) for r in node.rules],
            "on_error": node.on_error,
        }
    raise SpecError("Unknown rule(s) '%r'" % (node,))


def node_from_dict(d: Dict[str, Any]) -> Any:
    kind = d.get("kind")
    if kind == "rule":
        return Rule(
            key=d.get("key"),
            presence=_presence_from_dict(d.get("presence", "required")),
            validators=[_validator_from_dict(v) for v in d.get("validators", [])],
            converter=_converter_from_dict(d.get("converter")),
            childs=[node_from_dict(c) for c in d.get("childs", [])],
            on_error=d.get("on_error"),
        )
    if kind == "rule_and":
        return RuleAnd(rules=[node_from_dict(r) for r in d["rules"]], on_error=d.get("on_error"))
    if kind == "rule_or":
        return RuleOr(rules=[node_from_dict(r) for r in d["rules"]], on_error=d.get("on_error"))
    raise SpecError("Unknown rule kind '%r'" % (kind,))


def rules_to_json(rules: Any, indent: int = 1) -> str:
    return json.dumps([node_to_dict(n) for n in normalize_rules(rules)], indent=indent, sort_keys=True)


def rules_from_json(s: str) -> List[Any]:
    data = json.loads(s)
    if not isinstance(data, list):
        raise SpecError("rules JSON must be a list")
    return [node_from_dict(d) for d in data]
