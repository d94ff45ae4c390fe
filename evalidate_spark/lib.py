"""Library validators — the reference's "standard library"
(``/root/reference/include/evalidate_lib.hrl``), re-expressed as native
Column predicates (JVM-side, whole-stage-codegen) instead of per-row funs.

Each constructor returns a :class:`evalidate_spark.spec.Native` whose
``build(col, dtype)`` yields ``(fail_cond, message, error_kind)`` clauses and
whose ``oracle(value)`` is the pure-Python twin used by the test oracle.

Failure semantics match the reference custom-fun protocol: plain ``false`` →
the generic default message (``/root/reference/src/evv.erl:23-24``); only
``V_UNICODE_NULL`` carries a custom false-kind message and ``V_PASSWORD``
throws specific error-kind messages (``/root/reference/src/evv.erl:197-205``).
"""

from __future__ import annotations

import re as _re
from typing import Any, List, Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import errors as E
from .spec import Native

Clause = Tuple[Column, Any, bool]

# regexes pinned from /root/reference/include/evalidate_lib.hrl
EMAIL_RE = (
    r"^(|(([A-Za-z0-9]+_+)|([A-Za-z0-9]+\-+)|([A-Za-z0-9]+\.+)|([A-Za-z0-9]+\++))*"
    r"[A-Za-z0-9]+@((\w+\-+)|(\w+\.))*\w{1,63}\.[a-zA-Z]{2,8})$"
)  # :35
UUID_V4_RE = r"^[0-9A-F]{8}-[0-9A-F]{4}-4[0-9A-F]{3}-[89AB][0-9A-F]{3}-[0-9A-F]{12}$"  # :43
UUID_V1_RE = r"[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{12}"  # :48
# http_uri:parse accepts scheme://host[:port][/path] — pinned approximation (:26-32)
URL_RE = r"^(http|https|ftp)://[^\s/?#]+(/[^\s]*)?$"
SPECIAL_RE = r"""[\\\[!"#$%&'()*+,\-./:;<=>?@^_`{|}~\]]"""  # :217

PW_TOO_SHORT = "Password length must be at least 9 characters"  # evv.erl:200
PW_TOO_LONG = "Password length must be shorter than 256 characters"  # evv.erl:201
PW_CLASSES = (
    "Password must contain at least one uppercase, one lowercase, "
    "one special symbol and one numeric symbol"
)  # evv.erl:205


def _is_str(dt: T.DataType) -> bool:
    return isinstance(dt, T.StringType)


def _is_int(dt: T.DataType) -> bool:
    return isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))


def _is_num(dt: T.DataType) -> bool:
    return _is_int(dt) or isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType))


def _default_fail(cond: Column) -> List[Clause]:
    return [(cond, E.V_ERR_DEFAULT, False)]


def _limit_clauses(parsed: Column, lo: Optional[int], hi: Optional[int]) -> List[Clause]:
    """size_validator(limit, From, To, X) messages
    (``/root/reference/src/evv.erl:177-184``)."""
    out: List[Clause] = []
    if lo is not None:
        out.append((parsed < lo, E.size_min_msg("limit", lo), False))
    if hi is not None:
        out.append((parsed > hi, E.size_max_msg("limit", hi), False))
    return out


# -- integer --------------------------------------------------------- L1/L2
def v_binary_integer(lo: Optional[int] = None, hi: Optional[int] = None) -> Native:
    """?V_BINARY_INTEGER[/2] (`evalidate_lib.hrl:4-24`)."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if _is_int(dt):
            parsed = col
        elif _is_str(dt):
            parsed = col.try_cast("bigint")
        else:
            return _default_fail(F.lit(True))
        clauses: List[Clause] = []
        if _is_str(dt):
            # strict integer string: try_cast accepts '1.5' floors? no — cast
            # of '1.5' to bigint is NULL via try_cast in ANSI; also reject
            # leading/trailing junk with a regex guard like binary_to_integer
            strict = col.rlike(r"^[+-]?\d+$")
            clauses.append((~strict | parsed.isNull(), E.V_ERR_DEFAULT, False))
        clauses.extend(_limit_clauses(parsed, lo, hi))
        return clauses

    def oracle(v: Any) -> Any:
        if isinstance(v, bool):
            return False
        if isinstance(v, int):
            n = v
        elif isinstance(v, str) and _re.fullmatch(r"[+-]?\d+", v):
            n = int(v)
        else:
            return False
        if lo is not None and n < lo:
            return (False, E.size_min_msg("limit", lo))
        if hi is not None and n > hi:
            return (False, E.size_max_msg("limit", hi))
        return True

    return Native("v_binary_integer", build, oracle, params=(lo, hi))


# -- numeric --------------------------------------------------------- L8/L9
def v_binary_numeric(lo: Optional[float] = None, hi: Optional[float] = None) -> Native:
    """?V_BINARY_NUMERIC[/2] (`evalidate_lib.hrl:52-82`)."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if _is_num(dt):
            parsed = col.cast("double")
        elif _is_str(dt):
            parsed = col.try_cast("double")
        else:
            return _default_fail(F.lit(True))
        clauses: List[Clause] = []
        if _is_str(dt):
            strict = col.rlike(r"^[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+)$")
            clauses.append((~strict | parsed.isNull(), E.V_ERR_DEFAULT, False))
        clauses.extend(_limit_clauses(parsed, lo, hi))
        return clauses

    def oracle(v: Any) -> Any:
        if isinstance(v, bool):
            return False
        if isinstance(v, (int, float)):
            n = float(v)
        elif isinstance(v, str):
            try:
                n = float(v)
            except ValueError:
                return False
        else:
            return False
        if lo is not None and n < lo:
            return (False, E.size_min_msg("limit", lo))
        if hi is not None and n > hi:
            return (False, E.size_max_msg("limit", hi))
        return True

    return Native("v_binary_numeric", build, oracle, params=(lo, hi))


# -- boolean ---------------------------------------------------------- L10
def v_binary_boolean() -> Native:
    """?V_BINARY_BOOLEAN (`evalidate_lib.hrl:84-89`) — boolean or the exact
    strings 'true'/'false'."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if isinstance(dt, T.BooleanType):
            return []
        if _is_str(dt):
            return _default_fail(~col.isin("true", "false"))
        return _default_fail(F.lit(True))

    def oracle(v: Any) -> Any:
        return isinstance(v, bool) or v in ("true", "false")

    return Native("v_binary_boolean", build, oracle)


# -- url / email / uuid ------------------------------------------- L3/L4/L6/L7
def v_url() -> Native:
    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if not _is_str(dt):
            return _default_fail(F.lit(True))
        return _default_fail(~col.rlike(URL_RE))

    def oracle(v: Any) -> Any:
        return isinstance(v, str) and bool(_re.search(URL_RE, v))

    return Native("v_url", build, oracle)


def v_email() -> Native:
    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if not _is_str(dt):
            return _default_fail(F.lit(True))
        return _default_fail(~col.rlike(EMAIL_RE))

    def oracle(v: Any) -> Any:
        return isinstance(v, str) and bool(_re.search(EMAIL_RE, v))

    return Native("v_email", build, oracle)


def v_uuid_v4() -> Native:
    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if not _is_str(dt):
            return _default_fail(F.lit(True))
        return _default_fail(~col.rlike("(?i)" + UUID_V4_RE))

    def oracle(v: Any) -> Any:
        return isinstance(v, str) and bool(_re.search(UUID_V4_RE, v, _re.I))

    return Native("v_uuid_v4", build, oracle)


def v_uuid_v1() -> Native:
    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if not _is_str(dt):
            return _default_fail(F.lit(True))
        return _default_fail(~col.rlike(UUID_V1_RE))

    def oracle(v: Any) -> Any:
        return isinstance(v, str) and bool(_re.search(UUID_V1_RE, v))

    return Native("v_uuid_v1", build, oracle)


# -- password ----------------------------------------------------------- L5
def v_password() -> Native:
    """?V_PASSWORD — length 9..256 + 4 char classes, throwing specific
    error-kind messages (`/root/reference/src/evv.erl:197-223`)."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if not _is_str(dt):
            return [(F.lit(True), PW_CLASSES, True)]
        n = F.length(col)
        classes_ok = (
            col.rlike("[a-z]")
            & col.rlike("[A-Z]")
            & col.rlike(r"\d")
            & col.rlike(SPECIAL_RE)
        )
        return [
            (n < 9, PW_TOO_SHORT, True),
            (n > 256, PW_TOO_LONG, True),
            (~classes_ok, PW_CLASSES, True),
        ]

    def oracle(v: Any) -> Any:
        if not isinstance(v, str):
            return ("error", PW_CLASSES)
        if len(v) < 9:
            return ("error", PW_TOO_SHORT)
        if len(v) > 256:
            return ("error", PW_TOO_LONG)
        ok = (
            _re.search("[a-z]", v)
            and _re.search("[A-Z]", v)
            and _re.search(r"\d", v)
            and _re.search(SPECIAL_RE, v)
        )
        return True if ok else ("error", PW_CLASSES)

    return Native("v_password", build, oracle)


# -- misc ------------------------------------------------- L11/L12/L13/L14/L15
def elements_in(allowed: list) -> Native:
    """?ELEMENTS_IN (`evalidate_lib.hrl:91-95`) — every list element ∈ set."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if not isinstance(dt, T.ArrayType):
            return _default_fail(F.lit(True))
        ok = F.forall(col, lambda e: e.isin(*allowed))
        return _default_fail(~ok)

    def oracle(v: Any) -> Any:
        return isinstance(v, list) and all(e in allowed for e in v)

    return Native("elements_in", build, oracle, params=(list(allowed),))


def v_array() -> Native:
    """?V_ARRAY (`evalidate_lib.hrl:97-102`) — JSON-array shape."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if isinstance(dt, T.ArrayType):
            if isinstance(dt.elementType, T.StructType):
                return _default_fail(F.size(col) > 0)  # first elem is a tuple
            return []
        return _default_fail(F.lit(True))

    def oracle(v: Any) -> Any:
        if not isinstance(v, list):
            return False
        return len(v) == 0 or not isinstance(v[0], tuple)

    return Native("v_array", build, oracle)


def v_object() -> Native:
    """?V_OBJECT (`evalidate_lib.hrl:104-110`) — JSON-object shape."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if isinstance(dt, (T.MapType, T.StructType)):
            return []
        if isinstance(dt, T.ArrayType):
            if isinstance(dt.elementType, T.StructType):
                return []
            return _default_fail(F.size(col) > 0)
        return _default_fail(F.lit(True))

    def oracle(v: Any) -> Any:
        if isinstance(v, dict):
            return True
        if isinstance(v, list):
            return len(v) == 0 or isinstance(v[0], tuple)
        return False

    return Native("v_object", build, oracle)


def v_utf8() -> Native:
    """?V_UTF8 (`evalidate_lib.hrl:112-120`) — StringType is valid UTF-8 by
    construction; BinaryType checked with is_valid_utf8 (Spark 4 built-in)."""

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if _is_str(dt):
            return []
        if isinstance(dt, T.BinaryType):
            return _default_fail(~F.is_valid_utf8(col.cast("string")))
        return _default_fail(F.lit(True))

    def oracle(v: Any) -> Any:
        if isinstance(v, str):
            return True
        if isinstance(v, (bytes, bytearray)):
            try:
                bytes(v).decode("utf-8")
                return True
            except UnicodeDecodeError:
                return False
        return False

    return Native("v_utf8", build, oracle)


def v_unicode_null() -> Native:
    """?V_UNICODE_NULL (`evalidate_lib.hrl:122-130`) — no NUL byte; custom
    false-kind message (`ev_errors.hrl:42`)."""
    MSG = "Unsupported unicode control code"

    def build(col: Column, dt: T.DataType) -> List[Clause]:
        if not _is_str(dt) and not isinstance(dt, T.BinaryType):
            return [(F.lit(True), MSG, False)]
        return [(col.cast("string").contains("\x00"), MSG, False)]

    def oracle(v: Any) -> Any:
        if isinstance(v, str) and "\x00" not in v:
            return True
        if isinstance(v, (bytes, bytearray)) and b"\x00" not in bytes(v):
            return True
        return (False, MSG)

    return Native("v_unicode_null", build, oracle)


def c_lowercase() -> str:
    """?C_LOWERCASE (`evalidate_lib.hrl:132`) — named converter."""
    return "lowercase"


def validate_password(password: Any) -> bool:
    """Standalone ``validate_password/1`` entry
    (``/root/reference/src/evalidate.erl:36-37`` → ``src/evv.erl:197-223``):
    returns ``True`` or raises with the exact thrown message
    (suite ``:1652``, ``:1656``).

    This is the reference's only scalar public entry — a driver-side check,
    no job.  For column-scale password validation use the
    :func:`v_password` validator inside a rule."""
    from .engine import ValidationError

    res = v_password().oracle(password)
    if res is True:
        return True
    raise ValidationError(res[1])
