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
from typing import Any, Callable, Dict, List, Optional

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


# --------------------------------------------------------- JSON Schema
# Import a draft-07 JSON Schema subset as a rule spec: real-world data
# contracts are written as JSON Schema far more often than as bespoke
# rule files, and the mapping is near-exact because evalidate's validator
# kernel covers the same ground (type / presence / size / pattern / enum).

_JSON_TYPE_MAP = {
    "string": "binary",
    "integer": "integer",
    "number": "number",
    "boolean": "boolean",
    "array": "list",
}

# benign annotation keywords: carry no validation semantics
_ANNOTATIONS = frozenset(
    {"title", "description", "examples", "$schema", "$id", "$comment",
     "deprecated", "readOnly", "writeOnly"}
)

# structural keywords this importer cannot honor — refusing loudly beats
# silently validating less than the contract says
_UNSUPPORTED = frozenset(
    {"$ref", "allOf", "oneOf", "not", "if", "then", "else",
     "patternProperties", "propertyNames", "dependencies",
     "dependentSchemas", "dependentRequired", "exclusiveMinimum",
     "exclusiveMaximum", "multipleOf", "contains", "prefixItems",
     "additionalItems", "minProperties", "maxProperties"}
)

_FORMAT_MAP = {
    "uri": "v_url",
    "email": "v_email",
    "uuid": "v_uuid_v4",
}


def _int_bound(v: Any, kw: str) -> Optional[int]:
    if v is None:
        return None
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise SpecError("JSON Schema %s must be numeric" % kw)
    if isinstance(v, float):
        if not v.is_integer():
            raise SpecError(
                "JSON Schema %s=%r: non-integer bounds are not supported "
                "(size bounds are integers)" % (kw, v)
            )
        v = int(v)
    return v


def _check_keywords(s: Dict[str, Any], path: str) -> None:
    bad = sorted(set(s) & _UNSUPPORTED)
    if bad:
        raise SpecError(
            "JSON Schema keyword(s) %s at '%s' are not supported" % (bad, path)
        )


def _schema_validators(s: Dict[str, Any], path: str) -> List[Any]:
    """Validators for one (sub-)schema; nested objects are handled by the
    caller via childs."""
    _check_keywords(s, path)
    vals: List[Any] = []
    t = s.get("type")
    types = [t] if isinstance(t, str) else list(t or [])
    # JSON 'null' alternatives map to nothing: the engine treats a NULL
    # value as a MISSING key (reference presence semantics), so validators
    # never see nulls — dropping the alternative is exact
    types = [x for x in types if x != "null"]
    for x in types:
        if x not in _JSON_TYPE_MAP and x != "object":
            raise SpecError("JSON Schema type '%s' at '%s' is not supported" % (x, path))
    plain = [x for x in types if x not in ("object", "array")]
    if len(plain) == 1:
        vals.append(Type(_JSON_TYPE_MAP[plain[0]]))
    elif len(plain) > 1:
        vals.append(Type([_JSON_TYPE_MAP[x] for x in plain]))
    if "array" in types:
        items = s.get("items")
        if isinstance(items, dict) and "properties" not in items:
            _check_keywords(items, path + "/items")
            vals.append(Type(("list", _schema_validators(items, path + "/items"))))
        elif items is None:
            if not s.get("uniqueItems"):
                vals.append(Type("list"))
        elif not isinstance(items, dict):
            raise SpecError("tuple-form 'items' at '%s' is not supported" % path)
        if s.get("uniqueItems"):
            vals.append(Type("uniq_list"))
        lo = _int_bound(s.get("minItems"), "minItems")
        hi = _int_bound(s.get("maxItems"), "maxItems")
        if lo is not None or hi is not None:
            vals.append(Size(lo, hi))
    if "minLength" in s or "maxLength" in s:
        vals.append(
            Size(_int_bound(s.get("minLength"), "minLength"),
                 _int_bound(s.get("maxLength"), "maxLength"))
        )
    if "minimum" in s or "maximum" in s:
        vals.append(
            Size(_int_bound(s.get("minimum"), "minimum"),
                 _int_bound(s.get("maximum"), "maximum"))
        )
    if "pattern" in s:
        # JSON Schema patterns are unanchored contains-matches — exactly
        # the reference's regexp semantics (evv.erl:187-194)
        vals.append(Regexp(s["pattern"]))
    if "enum" in s:
        vals.append(Allowed(list(s["enum"])))
    if "const" in s:
        vals.append(Allowed([s["const"]]))
    if "format" in s:
        fmt = s["format"]
        if fmt not in _FORMAT_MAP:
            raise SpecError("JSON Schema format '%s' at '%s' is not supported" % (fmt, path))
        vals.append(LIB_REGISTRY[_FORMAT_MAP[fmt]]())
    if "anyOf" in s:
        alts = []
        for i, branch in enumerate(s["anyOf"]):
            bv = _schema_validators(branch, "%s/anyOf[%d]" % (path, i))
            if len(bv) != 1:
                raise SpecError(
                    "anyOf branch %d at '%s' must map to exactly one "
                    "validator (got %d)" % (i, path, len(bv))
                )
            alts.append(bv[0])
        vals.append(OrV(alts))
    return vals


def _object_rules(s: Dict[str, Any], path: str) -> List[Rule]:
    _check_keywords(s, path)
    props: Dict[str, Any] = s.get("properties", {}) or {}
    required = list(s.get("required", []) or [])
    for r in required:
        if not isinstance(r, str):
            raise SpecError("'required' entries must be strings at '%s'" % path)
    rules: List[Rule] = []
    for name in list(props) + [r for r in required if r not in props]:
        sub = props.get(name, {})
        if not isinstance(sub, dict):
            raise SpecError(
                "boolean property schemas at '%s/%s' are not supported" % (path, name)
            )
        presence: Any = "required" if name in required else "optional"
        if "default" in sub:
            presence = Default(sub["default"])
        childs: List[Rule] = []
        sub_t = sub.get("type")
        if sub_t == "object" or ("properties" in sub and sub_t is None):
            childs = _object_rules(sub, "%s/%s" % (path, name))
        items = sub.get("items")
        if isinstance(items, dict) and "properties" in items:
            # array of objects: element structure via the childs scope
            # (the compiler's array-of-struct HOF path, SURVEY §2 S8)
            childs = _object_rules(items, "%s/%s/items" % (path, name))
        rules.append(
            Rule(
                key=name,
                presence=presence,
                validators=_schema_validators(sub, "%s/%s" % (path, name)),
                childs=childs,
            )
        )
    return rules


def schema_to_rules(schema: Dict[str, Any]) -> List[Rule]:
    """Convert a draft-07 JSON Schema (object subset) into a rule spec.

    Supported: ``type`` (incl. unions; ``"null"`` alternatives drop out —
    the engine's presence layer owns NULLs), ``required``, ``default``
    (→ ``{optional, Default}``), ``minLength``/``maxLength`` and
    ``minimum``/``maximum`` (→ ``Size``; integer bounds only),
    ``pattern`` (→ ``Regexp`` — both are unanchored contains-matches),
    ``enum``/``const`` (→ ``Allowed``), ``format`` uri/email/uuid (→
    library validators), ``items`` + ``minItems``/``maxItems``/
    ``uniqueItems`` (→ ``{list, elem}`` / ``uniq_list`` / ``Size``),
    nested ``properties`` (→ ``childs``, incl. array-of-object), and
    single-validator ``anyOf`` branches (→ validator-level ``or``).

    Refused loudly (``SpecError``): ``$ref``, combinators this kernel
    can't express (``allOf``/``oneOf``/``not``/``if``), exclusive bounds,
    ``multipleOf``, pattern/boolean property schemas, tuple ``items``.
    ``additionalProperties`` is intentionally IGNORED: unruled-key
    passthrough is an engine option (``keep_unruled``), not a rule —
    pass ``keep_unruled=False`` to ``validate`` for
    ``additionalProperties: false`` contracts.

    Annotation keywords (title/description/examples/…) are skipped."""
    if not isinstance(schema, dict):
        raise SpecError("JSON Schema must be an object")
    t = schema.get("type", "object")
    if t != "object":
        raise SpecError("top-level JSON Schema must have type 'object'")
    extra = set(schema) - _ANNOTATIONS - {
        "type", "properties", "required", "additionalProperties", "definitions",
    }
    bad = sorted(extra & _UNSUPPORTED)
    if bad:
        raise SpecError("JSON Schema keyword(s) %s are not supported" % bad)
    return _object_rules(
        {k: v for k, v in schema.items() if k != "additionalProperties"}, "$"
    )


# ------------------------------------------------------- spec diffing
# The docstring's third promise (spec diffing across runs), plus contract
# evolution: given last run's rules and this run's, what changed, and is
# previously-clean data still clean?

def _expand_nodes(rules: Any) -> Dict[str, Dict[str, Any]]:
    """Normalize to one serialized node per key.  Multi-key rules expand
    (S7 semantics); top-level rules key as ``<top-level>``; combinators
    (RuleAnd/RuleOr) key as ``<and:i>``/``<or:i>`` by position — their
    internals are opaque to the per-key diff and always rate 'review'
    when they change."""
    out: Dict[str, Dict[str, Any]] = {}
    and_i = or_i = 0
    for node in normalize_rules(rules):
        if isinstance(node, Rule):
            keys = (
                ["<top-level>"]
                if node.key is None
                else ([node.key] if isinstance(node.key, str) else list(node.key))
            )
            for k in keys:
                d = node_to_dict(node)
                d["key"] = k
                if k in out:
                    raise SpecError("rules_diff: duplicate rule key '%s'" % k)
                out[k] = d
        elif isinstance(node, RuleAnd):
            out["<and:%d>" % and_i] = node_to_dict(node)
            and_i += 1
        else:
            out["<or:%d>" % or_i] = node_to_dict(node)
            or_i += 1
    return out


def rules_diff(old: Any, new: Any) -> List[Dict[str, Any]]:
    """Per-key diff of two rule specs → ``[{key, change, old, new}]``
    with ``change`` ∈ added | removed | changed, sorted by key.  Rules
    whose serialized form is identical don't appear."""
    o, n = _expand_nodes(old), _expand_nodes(new)
    diffs: List[Dict[str, Any]] = []
    for k in sorted(set(o) | set(n)):
        if k not in n:
            diffs.append({"key": k, "change": "removed", "old": o[k], "new": None})
        elif k not in o:
            diffs.append({"key": k, "change": "added", "old": None, "new": n[k]})
        elif o[k] != n[k]:
            diffs.append({"key": k, "change": "changed", "old": o[k], "new": n[k]})
    return diffs


def _bound(v: Any, side: str, default: float) -> float:
    return default if v is None else v


def _validator_impact(old_v: List[Dict], new_v: List[Dict]) -> (str, str):
    """Impact of a validator-list change on previously-CLEAN data:
    tightened → breaking, loosened → relaxed, ambiguous → review."""
    if old_v == new_v:
        return "compatible", "validators unchanged"
    ok = {json.dumps(v, sort_keys=True) for v in old_v}
    nk = {json.dumps(v, sort_keys=True) for v in new_v}
    if nk < ok:
        return "relaxed", "validators removed"
    # pairwise same-kind comparisons for the order-insensitive remainder
    added = [json.loads(s) for s in nk - ok]
    removed = [json.loads(s) for s in ok - nk]
    if len(added) == 1 and len(removed) == 1 and added[0].get("kind") == removed[0].get("kind"):
        a, r = added[0], removed[0]
        kind = a.get("kind")
        if kind == "size":
            lo_t = _bound(a.get("min"), "min", float("-inf")) > _bound(
                r.get("min"), "min", float("-inf")
            )
            hi_t = _bound(a.get("max"), "max", float("inf")) < _bound(
                r.get("max"), "max", float("inf")
            )
            lo_l = _bound(a.get("min"), "min", float("-inf")) < _bound(
                r.get("min"), "min", float("-inf")
            )
            hi_l = _bound(a.get("max"), "max", float("inf")) > _bound(
                r.get("max"), "max", float("inf")
            )
            if (lo_t or hi_t) and not (lo_l or hi_l):
                return "breaking", "size bounds tightened"
            if (lo_l or hi_l) and not (lo_t or hi_t):
                return "relaxed", "size bounds widened"
            return "review", "size bounds moved in both directions"
        if kind == "allowed":
            av, rv = a.get("values", []), r.get("values", [])
            try:
                a_set, r_set = set(av), set(rv)
            except TypeError:
                return "review", "allowed values changed (unhashable)"
            if a_set >= r_set:
                return "relaxed", "allowed set widened"
            if a_set <= r_set:
                return "breaking", "allowed set narrowed"
            return "review", "allowed set replaced"
        if kind == "regexp":
            return "review", "pattern changed (no containment check)"
        if kind == "type":
            return "review", "type changed"
    if not removed:
        return "breaking", "validators added"
    return "review", "validator set replaced"


def schema_compat(old: Any, new: Any) -> List[Dict[str, Any]]:
    """Classify :func:`rules_diff` entries by their impact on data that
    passed the OLD spec → ``[{key, change, impact, detail}]`` with
    ``impact`` ∈ breaking | relaxed | compatible | review:

    * added required rule → breaking; added optional → compatible.
    * removed rule → relaxed (less is validated).
    * presence optional→required → breaking; required→optional → relaxed.
    * Size/Allowed tightened → breaking; widened → relaxed.
    * Regexp/Type/combinator/converter changes → review (acceptance
      can't be compared structurally).
    * message-only changes (``on_error``) → compatible.

    Pair with :func:`schema_to_rules` to vet a JSON Schema contract bump
    before a run: ``schema_compat(schema_to_rules(v1),
    schema_to_rules(v2))``."""
    out: List[Dict[str, Any]] = []
    for d in rules_diff(old, new):
        k, change = d["key"], d["change"]
        if change == "added":
            req = d["new"].get("presence") == "required" if d["new"].get("kind") == "rule" else True
            impact = "breaking" if req else "compatible"
            detail = "new %s rule" % ("required" if req else "optional")
        elif change == "removed":
            impact, detail = "relaxed", "rule removed"
        elif d["old"].get("kind") != "rule" or d["new"].get("kind") != "rule":
            impact, detail = "review", "combinator changed"
        else:
            op, np_ = d["old"].get("presence"), d["new"].get("presence")
            if op != np_:
                if np_ == "required":
                    impact, detail = "breaking", "presence tightened to required"
                elif op == "required":
                    impact, detail = "relaxed", "presence loosened from required"
                else:
                    impact, detail = "compatible", "default changed"
            elif d["old"].get("validators") != d["new"].get("validators"):
                impact, detail = _validator_impact(
                    d["old"].get("validators", []), d["new"].get("validators", [])
                )
            elif d["old"].get("converter") != d["new"].get("converter"):
                impact, detail = "review", "converter changed"
            elif d["old"].get("childs") != d["new"].get("childs"):
                impact, detail = "review", "nested rules changed"
            else:
                impact, detail = "compatible", "message-only change"
        out.append({"key": k, "change": change, "impact": impact, "detail": detail})
    return out
