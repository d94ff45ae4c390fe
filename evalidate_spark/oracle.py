"""Pure-Python reference oracle.

A row-at-a-time implementation of the reference's semantics
(``/root/reference/src/evalidate.erl`` + ``src/evv.erl``), used ONLY by the
test suite to assert the Spark engine's results: depth-first rule order,
fail-fast first error, exact message rendering, conversion and output
reshaping.  It shares the spec dataclasses and the message templates with the
engine so the two cannot drift apart silently.

Value model parity with the Spark engine (see compiler pinning): ``None`` ≡
missing key; ``str`` ≡ binary; ``dict`` ≡ map/proplist; python ``tuple`` ≡
Erlang tuple; ``bool`` before ``int``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

from . import errors as E
from .spec import (
    DEPRECATED,
    OPTIONAL,
    REQUIRED,
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


class Throw(Exception):
    """Reference ``throw({error, Payload})`` — payload is a raw message or a
    structured ``{message, key, value}`` dict."""

    def __init__(self, payload: Any) -> None:
        super().__init__(str(payload))
        self.payload = payload

    @property
    def message(self) -> str:
        if isinstance(self.payload, dict):
            return self.payload["message"]
        return str(self.payload)


def validate_and_convert(rules: Any, data: Any, mode: str = "hard", parent_key: bool = True):
    """Entry mirroring ``validate_and_convert/3``
    (``/root/reference/src/evalidate.erl:19-34``)."""
    try:
        res = _struct(normalize_rules(rules), data, [], parent_key)
    except Throw as t:
        if mode == "soft":
            return ("error", t.payload)
        raise
    return ("ok", res) if mode == "soft" else res


def first_error(rules: Any, data: Any, parent_key: bool = True) -> Optional[Any]:
    """The depth-first first error payload, or None if the row passes."""
    try:
        _struct(normalize_rules(rules), data, [], parent_key)
        return None
    except Throw as t:
        return t.payload


# ---------------------------------------------------------------- dispatch
def _struct(rules: list, data: Any, parents: list, pk: bool):
    # table mode: one rule-set over a list of rows
    # (/root/reference/src/evalidate.erl:48-49)
    if isinstance(data, list) and data and isinstance(data[0], (dict, list)):
        return [_rules(rules, seg, parents, pk) for seg in data]
    return _rules(rules, data, parents, pk)


def _rules(rules: list, data: Any, parents: list, pk: bool) -> Any:
    out: List[Tuple[Any, Any]] = []
    for node in rules:
        res = _rule(node, data, parents, pk)
        out.extend(res)
    return dict(out)


def _rule(node: Any, data: Any, parents: list, pk: bool) -> list:
    if isinstance(node, Rule):
        keys = (
            [None]
            if node.key is None
            else ([node.key] if isinstance(node.key, str) else list(node.key))
        )
        out = []
        for k in keys:
            out.extend(_one_key(node, k, data, parents, pk))
        return out
    if isinstance(node, RuleAnd):
        try:
            out = []
            for sub in node.rules:
                out.extend(_rule(sub, data, parents, pk))
            return out
        except Throw:
            if node.on_error is not None:
                raise Throw(node.on_error)
            raise
    if isinstance(node, RuleOr):
        errors: list = []
        for alt in node.rules:
            try:
                return _rule(alt, data, parents, pk)
            except Throw as t:
                errors.insert(0, t.message)  # reverse accumulation (:258)
        if node.on_error is not None:
            raise Throw(node.on_error)
        raise Throw(E.join_or_messages(errors))
    raise SpecError("Unknown rule(s) '%r'" % (node,))


def _key_path(key: Optional[str], parents: list, pk: bool) -> str:
    if not pk:
        return key or ""
    return ".".join([*parents, key] if key is not None else parents)


def _one_key(rule: Rule, key: Optional[str], data: Any, parents: list, pk: bool) -> list:
    kp = _key_path(key, parents, pk)
    if key is None:
        value = data
    else:
        value = data.get(key) if isinstance(data, dict) else None
    # presence (/root/reference/src/evalidate.erl:112-128)
    if key is not None and value is None:
        if isinstance(rule.presence, Default):
            return [(key, rule.presence.value)]
        if rule.presence == REQUIRED:
            raise Throw(E.key_required_msg(kp))
        return []  # optional | deprecated, missing
    if rule.presence == DEPRECATED:
        raise Throw(E.key_deprecated_msg(str(key)))

    # validators (/root/reference/src/evalidate.erl:130-143)
    if rule.validators:
        res = _validate(list(rule.validators), value, data)
        if res is not True:
            kind, msg = res
            if kind == "error":
                raise Throw(msg)
            message = (
                E.resolve_on_error(rule.on_error, kp if key is not None else None, value)
                if rule.on_error is not None
                else msg
            )
            raise Throw(
                {
                    "message": message,
                    "key": E.unscriptize(kp) if kp else kp,
                    "value": E.maybe_cut(E.unscriptize(E.fmt_ts(value))),
                }
            )

    # childs (/root/reference/src/evalidate.erl:145-155)
    if rule.childs:
        if isinstance(value, dict):
            value = _rules(list(rule.childs), value, [*parents, key], pk)
        elif isinstance(value, list) and all(isinstance(e, dict) for e in value):
            value = [_rules(list(rule.childs), e, [*parents, key], pk) for e in value]
        else:
            raise Throw(E.TPL_WRONG_CHILDS.format(key=kp))

    # convert (/root/reference/src/evalidate.erl:157-206)
    if rule.converter == "no_return":
        return []
    converted = _convert(rule.converter, value, data, key)
    if key is None:
        return list(converted.items()) if isinstance(converted, dict) else [(None, converted)]
    return [(key, converted)]


# ---------------------------------------------------------------- validators
def _validate(validators: Sequence[Any], value: Any, data: Any):
    """Conjunctive fold with short-circuit (`/root/reference/src/evv.erl:18-29`).
    Returns True | ('false', msg) | ('error', msg)."""
    for v in validators:
        res = _validate_one(v, value, data)
        if res is True:
            continue
        return res
    return True


def _validate_one(v: Any, value: Any, data: Any):
    if isinstance(v, Type):
        r = _type_matches(v.of, value)
        if r is True:
            return True
        return (
            "false",
            E.wrong_type_msg(E.fmt_ts(value), v.of),
        )
    if isinstance(v, Size):
        return _size(v.min, v.max, value)
    if isinstance(v, Regexp):
        import re

        if not isinstance(value, str):
            return ("error", E.ERR_BAD_REGEXP)
        if re.search(v.pattern, value):
            return True
        return ("false", E.regexp_msg(E.fmt_ts(value), v.pattern))
    if isinstance(v, Allowed):
        vals = list(v.values)
        if any(value == x and type(value) == type(x) for x in vals) or (
            not isinstance(value, bool) and value in [x for x in vals if not isinstance(x, bool)]
        ):
            return True
        return ("false", E.not_allowed_msg(E.fmt_p(value), vals))
    if isinstance(v, OrV):
        for alt in v.alternatives:
            res = _validate_one(alt, value, data)
            if res is True:
                return True
            if res[0] == "error":
                return res
        return ("false", E.V_ERR_DEFAULT)
    if isinstance(v, EqualToObjectOfOtherKeys):
        for k in v.keys:
            other = data.get(k) if isinstance(data, dict) else None
            if not _equal_objects(value, other):
                return ("false", E.V_ERR_DEFAULT)
        return True
    if isinstance(v, Native):
        res = v.oracle(value) if v.oracle else True
        if res is True:
            return True
        if res is False:
            return ("false", E.V_ERR_DEFAULT)
        if isinstance(res, tuple) and res[0] is False:
            return ("false", res[1])
        if isinstance(res, tuple) and res[0] == "error":
            return ("error", res[1])
        return ("error", E.ERR_WRONG_FUN)
    if isinstance(v, CustomValidator):
        try:
            res = v.fn(value) if v.arity == 1 else v.fn(value, data)
        except Throw as t:
            return ("error", t.message)
        except Exception:
            return ("error", E.ERR_WRONG_FUN)
        if res is True:
            return True
        if res is False:
            return ("false", E.V_ERR_DEFAULT)
        if isinstance(res, tuple) and len(res) == 2 and res[0] is False:
            return ("false", res[1])
        if isinstance(res, tuple) and len(res) == 2 and res[0] == "error":
            return ("error", res[1])
        return ("error", E.ERR_WRONG_FUN)
    return ("error", "Unknown validator '%r'" % (v,))


def _type_matches(cond: Any, value: Any):
    if isinstance(cond, str):
        if cond == "binary":
            return isinstance(value, str)
        if cond == "list":
            return isinstance(value, (list, dict))
        if cond == "tuple":
            return isinstance(value, tuple)
        if cond == "boolean":
            return isinstance(value, bool)
        if cond == "integer":
            return isinstance(value, int) and not isinstance(value, bool)
        if cond == "float":
            return isinstance(value, float)
        if cond == "number":
            return isinstance(value, (int, float)) and not isinstance(value, bool)
        if cond == "atom":
            return isinstance(value, bool)
        if cond == "uniq_list":
            return isinstance(value, (list, dict)) and _is_unique_list(
                value if isinstance(value, list) else list(value.items())
            )
        if cond == "list_of_equal_objects":
            return isinstance(value, list) and _is_list_of_equal_objects(value)
        raise SpecError("Unknown type validator '%s'" % cond)
    if isinstance(cond, tuple) and len(cond) == 2 and cond[0] == "list":
        return isinstance(value, list) and all(
            _validate(list(cond[1]), e, None) is True for e in value
        )
    if isinstance(cond, list):
        return any(_type_matches(c, value) is True for c in cond)
    raise SpecError("Unknown type validator '%r'" % (cond,))


def _elem_key(e: Any):
    """Proplist-element key: 2-tuple → first; dict → first field value."""
    if isinstance(e, tuple) and len(e) == 2:
        return ("k", e[0])
    if isinstance(e, dict) and e:
        return ("k", e[next(iter(e))])
    return ("v", _hashable(e))


def _hashable(e: Any):
    if isinstance(e, list):
        return tuple(_hashable(x) for x in e)
    if isinstance(e, dict):
        return tuple(sorted((k, _hashable(v)) for k, v in e.items()))
    return e


def _is_unique_list(value: list) -> bool:
    seen = set()
    for e in value:
        k = _elem_key(e)
        if k in seen:
            return False
        seen.add(k)
    return True


def _is_list_of_equal_objects(value: list) -> bool:
    # /root/reference/src/evv.erl:128-138
    if len(value) <= 1:
        return False
    first = value[0]
    keys = _obj_keys(first)
    if keys is None or not keys:
        return False
    for obj in value[1:]:
        ok = _obj_keys(obj)
        if ok is None or len(ok) != len(keys) or set(ok) != set(keys):
            return False
    return True


def _obj_keys(obj: Any):
    if isinstance(obj, dict):
        return list(obj.keys())
    if isinstance(obj, list) and all(isinstance(t, tuple) and len(t) == 2 for t in obj):
        return [t[0] for t in obj]
    return None


def _equal_objects(a: Any, b: Any) -> bool:
    ka, kb = _obj_keys(a), _obj_keys(b)
    return ka is not None and kb is not None and bool(ka) and set(ka) == set(kb) and len(
        ka
    ) == len(kb)


def _size(lo: Optional[int], hi: Optional[int], value: Any):
    # /root/reference/src/evv.erl:164-184
    if isinstance(value, str):
        sz, param = len(value), "byte_size"
    elif isinstance(value, (list, dict)):
        sz, param = len(value), "length"
    elif isinstance(value, bool):
        raise SpecError("size validator unsupported for boolean")
    elif isinstance(value, (int, float)):
        sz, param = value, "limit"
    else:
        raise SpecError("size validator unsupported for %r" % (value,))
    if lo is not None and sz < lo:
        return ("false", E.size_min_msg(param, lo))
    if hi is not None and sz > hi:
        return ("false", E.size_max_msg(param, hi))
    return True


# ---------------------------------------------------------------- converters
def _convert(conv: Any, value: Any, data: Any, key: Any):
    if conv is None:
        return value
    try:
        return _convert_(conv, value, data)
    except Throw:
        raise
    except Exception:
        raise Throw(E.couldnt_convert_msg(E.fmt_ts(value), key))


def _convert_(conv: Any, value: Any, data: Any):
    if isinstance(conv, str):
        if conv == "to_int":
            if isinstance(value, bool):
                raise ValueError
            return int(value)
        if conv == "to_float":
            return float(value)
        if conv in ("to_binary", "to_list", "to_atom"):
            if isinstance(value, bool):
                return "true" if value else "false"
            return value if isinstance(value, str) else str(value)
        if conv == "to_boolean":
            if isinstance(value, bool):
                return value
            if value == "true":
                return True
            if value == "false":
                return False
            raise ValueError
        if conv == "lowercase":
            return value.lower()
        if conv == "filter_duplicates":
            seen, out = set(), []
            for e in value:
                k = _elem_key(e)
                if k not in seen:
                    seen.add(k)
                    out.append(e)
            return out
        raise Throw("Wrong converter")
    if isinstance(conv, Each):
        return [_convert_(conv.conv, e, data) for e in value]
    if isinstance(conv, CustomConverter):
        res = conv.fn(value) if conv.arity == 1 else conv.fn(value, data)
        if isinstance(res, tuple) and len(res) == 2 and res[0] == "error":
            raise Throw(res[1])
        return res
    raise Throw("Wrong converter")
