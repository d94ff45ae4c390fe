"""Error-message rendering with reference parity.

Templates pinned from ``/root/reference/include/ev_errors.hrl`` and the
formatting kernel ``evv:error_str`` (``/root/reference/src/evv.erl:225-234``).

Canonical value representation: the reference formats values with Erlang
``~ts`` (string-ish) or ``~p`` (term repr).  Our data model is Spark-typed
(string/long/double/boolean/array/map/struct), so we pin a canonical repr per
Spark type that matches the reference's output for every value that can occur
in both systems (strings, integers, floats, booleans, flat lists).  Divergence
(documented): truncation is 128 *characters* (the reference cuts at 128
UTF-8 bytes, ``/root/reference/src/evv.erl:233-234``) — identical for ASCII.
"""

from __future__ import annotations

from typing import Any, Optional

# -- templates (ev_errors.hrl) ------------------------------------------------
V_ERR_DEFAULT = "Value is not valid"  # :9
ERR_BAD_REGEXP = "Bad regexp"  # :6
ERR_WRONG_FUN = "Wrong validation function"  # :7

TPL_WRONG_TYPE = "Value '{value}' is not valid. Type of value is not '{type}'"  # :11
TPL_LESS_MIN = "Value is not valid. Value's {param} is less than minimum allowed: {min}"  # :12
TPL_MORE_MAX = "Value is not valid. Value's {param} is more than maximum allowed: {max}"  # :13
TPL_NOT_ALLOWED = "Value '{value}' is not valid. Value is not in allowed list {allowed}"  # :14
TPL_REGEXP = "Value '{value}' is not valid. Validation with regexp '{regexp}' failed"  # :15
TPL_KEY_REQUIRED = "Key '{key}' is required"  # :34
TPL_KEY_DEPRECATED = "Key '{key}' is deprecated"  # :35
TPL_WRONG_CHILDS = "Wrong childs for key '{key}'"  # :37
# note trailing space — present in the reference template (:40)
TPL_COULDNT_CONVERT = "Couldn't convert value '{value}' for key '{key}' "

MAX_VALUE_CHARS = 128  # /root/reference/src/evv.erl:233


def unscriptize(s: str) -> str:
    """Escape ``<``/``>`` with a backslash (anti-XSS),
    ``/root/reference/include/ev_errors.hrl:17-22``."""
    return s.replace("<", "\\<").replace(">", "\\>")


def maybe_cut(s: str) -> str:
    """Truncate to 128 chars + '...' (``/root/reference/src/evv.erl:233-234``)."""
    if len(s) > MAX_VALUE_CHARS:
        return s[:MAX_VALUE_CHARS] + "..."
    return s


def _num_repr(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Erlang prints floats with at least one decimal; Python's repr
        # matches for the values in our data model (1.5 -> '1.5').
        return repr(v)
    return str(v)


def fmt_ts(v: Any) -> str:
    """Render a value in a ``~ts`` context (``evv:error_str`` param mapping,
    ``/root/reference/src/evv.erl:226-230``): numbers → decimal, strings →
    themselves (cut), other terms → ``~p`` repr (cut)."""
    if v is None:
        return "undefined"
    if isinstance(v, str):
        return maybe_cut(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _num_repr(v)
    return maybe_cut(fmt_p(v))


def fmt_p(v: Any) -> str:
    """Erlang-ish ``~p`` term repr, canonicalised for our data model:
    strings → ``<<"s">>``, arrays → ``[..]``, maps/structs → proplist
    ``[{k,v},..]``, numbers/booleans → literals, null → ``undefined``."""
    if v is None:
        return "undefined"
    if isinstance(v, str):
        return '<<"%s">>' % v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _num_repr(v)
    if isinstance(v, tuple):
        # Erlang tuple — the canonical python twin of a StructType value
        return "{%s}" % ",".join(fmt_p(x) for x in v)
    if isinstance(v, list):
        return "[%s]" % ",".join(fmt_p(x) for x in v)
    if isinstance(v, dict):
        return "[%s]" % ",".join("{%s,%s}" % (fmt_p(k), fmt_p(x)) for k, x in v.items())
    return maybe_cut(str(v))


def type_cond_name(cond: Any) -> str:
    """Render the type condition for the wrong-type message (`~s` of the
    cond atom, ``ev_errors.hrl:11``).  Union lists concatenate the names
    (Erlang ``~s`` on a list of atoms flattens them); the element-validated
    list form renders as ``list``."""
    if isinstance(cond, str):
        return cond
    if isinstance(cond, tuple) and len(cond) == 2 and cond[0] == "list":
        return "list"
    if isinstance(cond, (list,)):
        # union renders as the Erlang list literal: '[integer,binary]'
        # (suite test_type_validators_bad expected message)
        return "[%s]" % ",".join(type_cond_name(c) for c in cond)
    return str(cond)


def wrong_type_msg(value_ts: str, cond: Any) -> str:
    return TPL_WRONG_TYPE.format(value=unscriptize(value_ts), type=type_cond_name(cond))


def size_min_msg(param: str, lo: int) -> str:
    return TPL_LESS_MIN.format(param=param, min=lo)


def size_max_msg(param: str, hi: int) -> str:
    return TPL_MORE_MAX.format(param=param, max=hi)


def not_allowed_msg(value_p: str, allowed: Any) -> str:
    return TPL_NOT_ALLOWED.format(
        value=unscriptize(value_p), allowed=fmt_p(list(allowed))
    )


def regexp_msg(value_ts: str, regexp: str) -> str:
    return TPL_REGEXP.format(value=unscriptize(value_ts), regexp=regexp)


def key_required_msg(key_path: str) -> str:
    return TPL_KEY_REQUIRED.format(key=key_path)


def key_deprecated_msg(key: str) -> str:
    # deprecated uses the bare key, not the dotted parent path
    # (/root/reference/src/evalidate.erl:123-124)
    return TPL_KEY_DEPRECATED.format(key=key)


def couldnt_convert_msg(value_ts: str, key: Any) -> str:
    # a keyless (bare-value / top-level) rule renders the key atom `none`,
    # not `undefined` (/root/reference/src/evalidate.erl:176-178 with
    # Key = none)
    return TPL_COULDNT_CONVERT.format(
        value=value_ts, key="none" if key is None else fmt_ts(key)
    )


def resolve_on_error(template: str, key: Any, value: Any) -> str:
    """``on_validate_error`` template substitution
    (``/root/reference/src/evalidate.erl:214-223``)."""
    key_s = unscriptize(fmt_ts(key) if key is not None else "none")
    val_s = unscriptize(fmt_ts(value))
    return template.replace("{{key}}", key_s).replace("{{value}}", val_s)


def join_or_messages(messages: list) -> str:
    """Dedupe (first occurrence wins) + join with ``" or "``; caller passes
    messages already in reverse trial order
    (``/root/reference/src/evalidate.erl:251-265``)."""
    seen, out = set(), []
    for m in messages:
        if m not in seen:
            seen.add(m)
            out.append(m)
    return " or ".join(out)
