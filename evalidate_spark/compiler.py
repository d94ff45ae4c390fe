"""Spec → Spark plan compiler.

Driver-side compiler that turns a :mod:`evalidate_spark.spec` rule tree into

* one ``violations`` Column — ``array<struct<rule_seq,rule_id,key_path,
  span_index,message,value_repr>>`` computed in a **single fused projection**
  (Catalyst folds every check into one WholeStageCodegen stage: no shuffle,
  no per-row Python unless a custom fn is used, and then it is an
  Arrow-batched pandas UDF), and
* an ordered output projection (converted values, defaults injected,
  ``no_return`` keys dropped) mirroring the reference's output reshaping
  (``/root/reference/src/evalidate.erl:145-206``).

Fail-fast parity: the reference throws at the first violating rule in
depth-first order (``/root/reference/src/evalidate.erl:211-212``).  We compute
*all* violations per row (richer), ordered by depth-first ``rule_seq``, so the
reference's answer is exactly ``violations[0]`` (`first_error`).

Validator messages follow ``/root/reference/include/ev_errors.hrl`` templates
bit-for-bit; see :mod:`evalidate_spark.errors`.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable, List, Optional, Sequence, Tuple

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

VIOLATION_FIELDS = ["rule_seq", "rule_id", "key_path", "span_index", "message", "value_repr"]

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType, T.DecimalType)


# --------------------------------------------------------------------------
# column-side message helpers (mirror errors.py for dynamic values)
# --------------------------------------------------------------------------
def c_unscriptize(col: Column) -> Column:
    """Column-side ``?UNSCRIPTIZE`` (`ev_errors.hrl:17-22`)."""
    return F.regexp_replace(col, "([<>])", r"\\$1")


def c_maybe_cut(col: Column) -> Column:
    return F.when(
        F.length(col) > E.MAX_VALUE_CHARS,
        F.concat(F.substring(col, 1, E.MAX_VALUE_CHARS), F.lit("...")),
    ).otherwise(col)


def _is_string(dt: T.DataType) -> bool:
    return isinstance(dt, T.StringType)


def _is_int(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC)


def _is_float(dt: T.DataType) -> bool:
    return isinstance(dt, _FLOATING)


def _is_number(dt: T.DataType) -> bool:
    return _is_int(dt) or _is_float(dt)


def c_p_repr(col: Column, dt: T.DataType) -> Column:
    """Column-side canonical ``~p`` repr (see ``errors.fmt_p``)."""
    if _is_string(dt):
        return F.concat(F.lit('<<"'), col, F.lit('">>'))
    if isinstance(dt, T.BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if _is_number(dt):
        return col.cast("string")
    if isinstance(dt, T.ArrayType):
        return F.concat(
            F.lit("["),
            F.array_join(F.transform(col, lambda e: c_p_repr(e, dt.elementType)), ","),
            F.lit("]"),
        )
    if isinstance(dt, T.MapType):
        entries = F.transform(
            F.map_entries(col),
            lambda kv: F.concat(
                F.lit("{"),
                c_p_repr(kv["key"], dt.keyType),
                F.lit(","),
                c_p_repr(kv["value"], dt.valueType),
                F.lit("}"),
            ),
        )
        return F.concat(F.lit("["), F.array_join(entries, ","), F.lit("]"))
    if isinstance(dt, T.StructType):
        parts: List[Column] = [F.lit("{")]
        for i, f_ in enumerate(dt.fields):
            if i:
                parts.append(F.lit(","))
            parts.append(c_p_repr(col.getField(f_.name), f_.dataType))
        parts.append(F.lit("}"))
        return F.concat(*parts)
    return col.cast("string")


def c_ts_repr(col: Column, dt: T.DataType) -> Column:
    """Column-side ``~ts`` repr (see ``errors.fmt_ts``)."""
    if _is_string(dt):
        return c_maybe_cut(col)
    if isinstance(dt, T.BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if _is_number(dt):
        return col.cast("string")
    return c_maybe_cut(c_p_repr(col, dt))


# --------------------------------------------------------------------------
# compile context
# --------------------------------------------------------------------------
@dataclass
class Options:
    mode: str = "soft"  # 'soft' | 'hard'  (/root/reference/src/evalidate.erl:22-34)
    parent_key: bool = True  # dotted key paths in messages (:267-279)
    keep_unruled: bool = False  # reference drops unruled keys (suite :1703-1716)


class _Seq:
    def __init__(self) -> None:
        self.n = 0

    def next(self) -> int:
        self.n += 1
        return self.n


@dataclass
class Scope:
    """Where values are resolved from: top-level columns, a nested struct,
    or an array element inside a higher-order-function lambda."""

    get: Callable[[str], Column]  # key -> value Column (or raises KeyError)
    dtype_of: Callable[[str], T.DataType]
    has: Callable[[str], bool]
    parents: Tuple[str, ...] = ()
    in_element: bool = False  # True inside HOF lambda (no UDFs allowed)
    span_index: Optional[Column] = None


@dataclass
class OutCol:
    name: str
    col: Column
    dtype: T.DataType
    # per-row "this rule emitted a pair for this key" condition (None =
    # always). The reference's output is a proplist: an optional rule with a
    # missing value emits no pair, and a rule_or emits only the winning
    # alternative's pairs — later pairs overwrite earlier ones only where
    # they exist.
    present: Optional[Column] = None


@dataclass
class Compiled:
    """Result of compiling a spec against a schema."""

    violations: Column  # array<struct<...>> in depth-first order
    outputs: List[OutCol]
    opts: Options

    def first_error(self) -> Column:
        return F.try_element_at(self.violations, F.lit(1))


def _viol_struct(
    seq: int,
    rule_id: str,
    key_path: Optional[Column],
    message: Column,
    value_repr: Optional[Column],
    span_index: Optional[Column] = None,
) -> Column:
    return F.struct(
        F.lit(seq).cast("int").alias("rule_seq"),
        F.lit(rule_id).alias("rule_id"),
        (key_path if key_path is not None else F.lit(None).cast("string")).alias("key_path"),
        (span_index if span_index is not None else F.lit(None).cast("int")).alias("span_index"),
        message.cast("string").alias("message"),
        (value_repr if value_repr is not None else F.lit(None).cast("string")).alias(
            "value_repr"
        ),
    )


def _empty_viols() -> Column:
    return F.expr(
        "array()"
    ).cast(
        "array<struct<rule_seq:int,rule_id:string,key_path:string,"
        "span_index:int,message:string,value_repr:string>>"
    )


def _entry_array(entry: Column) -> Column:
    """Wrap a nullable violation struct into a 0/1-element array."""
    return F.filter(F.array(entry), lambda x: x.isNotNull())


# --------------------------------------------------------------------------
# validator compilation: (fail_msg Column|None, is_error_kind chain)
# --------------------------------------------------------------------------
@dataclass
class VClause:
    """One WHEN clause of a rule's validator chain: if `cond` then the rule
    fails with `message`.  `error_kind` distinguishes the reference's
    ``{error, Msg}`` (raw throw, bypasses on_validate_error and the
    structured payload — ``/root/reference/src/evalidate.erl:134-136``) from
    ``{false, Msg}`` (wrapped + overridable)."""

    cond: Column
    message: Column
    error_kind: bool = False


def _type_matches(cond: Any, col: Column, dt: T.DataType, scope: Scope) -> Optional[Column]:
    """Return None for statically-true, a boolean Column otherwise
    (F.lit(False) when statically false)."""
    if isinstance(cond, str):
        if cond == "binary":
            ok = _is_string(dt) or isinstance(dt, T.BinaryType)
            return None if ok else F.lit(False)
        if cond == "list":
            ok = isinstance(dt, (T.ArrayType, T.MapType))
            return None if ok else F.lit(False)
        if cond == "tuple":
            ok = isinstance(dt, T.StructType)
            return None if ok else F.lit(False)
        if cond == "boolean":
            return None if isinstance(dt, T.BooleanType) else F.lit(False)
        if cond == "integer":
            return None if _is_int(dt) else F.lit(False)
        if cond == "float":
            return None if _is_float(dt) else F.lit(False)
        if cond == "number":
            return None if _is_number(dt) else F.lit(False)
        if cond == "atom":
            # atoms do not exist in the Spark data model except booleans
            return None if isinstance(dt, T.BooleanType) else F.lit(False)
        if cond == "uniq_list":
            if isinstance(dt, T.MapType):
                # proplist uniq_list = unique KEYS (/root/reference/src/evv.erl:140-147);
                # a Spark map's keys are unique by construction
                return None
            if not isinstance(dt, T.ArrayType):
                return F.lit(False)
            elem = dt.elementType
            if isinstance(elem, T.StructType) and elem.fields:
                # proplist semantics: unique by first field (the key) —
                # /root/reference/src/evv.erl:140-147
                k = elem.fields[0].name
                keys = F.transform(col, lambda e: e.getField(k))
                return F.size(keys) == F.size(F.array_distinct(keys))
            return F.size(col) == F.size(F.array_distinct(col))
        if cond == "list_of_equal_objects":
            # /root/reference/src/evv.erl:128-138
            if not isinstance(dt, T.ArrayType):
                return F.lit(False)
            elem = dt.elementType
            if isinstance(elem, T.MapType):
                keysets = F.transform(col, lambda m: F.array_sort(F.map_keys(m)))
                return (
                    (F.size(col) >= 2)
                    & (F.size(F.try_element_at(keysets, F.lit(1))) > 0)
                    & (F.size(F.array_distinct(keysets)) == 1)
                )
            if isinstance(elem, T.StructType):
                ok_shape = len(elem.fields) > 0
                return (F.size(col) >= 2) if ok_shape else F.lit(False)
            return F.lit(False)
        raise SpecError("Unknown type validator '%s'" % cond)
    if isinstance(cond, tuple) and len(cond) == 2 and cond[0] == "list":
        if not isinstance(dt, T.ArrayType):
            return F.lit(False)
        elem_dt = dt.elementType

        def elem_ok(e: Column) -> Column:
            clauses = _compile_validators(list(cond[1]), e, elem_dt, scope, in_hof=True)
            ok = F.lit(True)
            for cl in clauses:
                ok = ok & ~F.coalesce(cl.cond, F.lit(False))
            return ok

        return F.forall(col, elem_ok)
    if isinstance(cond, list):
        sub = [_type_matches(c, col, dt, scope) for c in cond]
        if any(s is None for s in sub):
            return None
        out = sub[0]
        for s in sub[1:]:
            out = out | s
        return out
    raise SpecError("Unknown type validator '%r'" % (cond,))


def _size_of(col: Column, dt: T.DataType) -> Tuple[Column, str]:
    """(size expr, parameter label) — /root/reference/src/evv.erl:164-176.
    The reference labels string sizes 'byte_size' while counting unicode
    chars; we pin the same label + char count."""
    if _is_string(dt):
        return F.length(col), "byte_size"
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return F.size(col), "length"
    if _is_number(dt):
        return col, "limit"
    raise SpecError("size validator unsupported for column type %s" % dt.simpleString())


def _compile_validators(
    validators: Sequence[Any],
    col: Column,
    dt: T.DataType,
    scope: Scope,
    in_hof: bool = False,
) -> List[VClause]:
    """Compile a conjunctive validator list into ordered WHEN clauses.
    Evaluation order == list order, reproducing the reference's
    short-circuit (``/root/reference/src/evv.erl:18-29``)."""
    clauses: List[VClause] = []
    for v in validators:
        if isinstance(v, Type):
            ok = _type_matches(v.of, col, dt, scope)
            if ok is None:
                continue  # statically true
            msg = F.concat(
                F.lit("Value '"),
                c_unscriptize(c_ts_repr(col, dt)),
                F.lit("' is not valid. Type of value is not '%s'" % E.type_cond_name(v.of)),
            )
            clauses.append(VClause(~ok, msg))
        elif isinstance(v, Size):
            sz, param = _size_of(col, dt)
            if v.min is not None:
                clauses.append(
                    VClause(sz < v.min, F.lit(E.size_min_msg(param, v.min)))
                )
            if v.max is not None:
                clauses.append(
                    VClause(sz > v.max, F.lit(E.size_max_msg(param, v.max)))
                )
        elif isinstance(v, Regexp):
            if _is_string(dt):
                msg = F.concat(
                    F.lit("Value '"),
                    c_unscriptize(c_ts_repr(col, dt)),
                    F.lit("' is not valid. Validation with regexp '%s' failed" % v.pattern),
                )
                clauses.append(VClause(~col.rlike(v.pattern), msg))
            else:
                # non-binary value → {error, Bad regexp} (/root/reference/src/evv.erl:193-194)
                clauses.append(
                    VClause(F.lit(True), F.lit(E.ERR_BAD_REGEXP), error_kind=True)
                )
        elif isinstance(v, Allowed):
            vals = [x for x in v.values]
            lits = _isin_literals(vals, dt)
            cond = ~col.isin(lits) if lits else F.lit(True)
            msg = F.concat(
                F.lit("Value '"),
                c_unscriptize(c_p_repr(col, dt)),
                F.lit("' is not valid. Value is not in allowed list %s" % E.fmt_p(vals)),
            )
            clauses.append(VClause(cond, msg))
        elif isinstance(v, OrV):
            clauses.append(_compile_or_validator(v, col, dt, scope, in_hof))
        elif isinstance(v, EqualToObjectOfOtherKeys):
            conds = []
            for k in v.keys:
                if not scope.has(k):
                    conds.append(F.lit(False))
                    continue
                other, odt = scope.get(k), scope.dtype_of(k)
                conds.append(_equal_objects(col, dt, other, odt))
            ok = conds[0]
            for c in conds[1:]:
                ok = ok & c
            clauses.append(VClause(~ok, F.lit(E.V_ERR_DEFAULT)))
        elif isinstance(v, Native):
            for cond, message, err in v.build(col, dt):
                msg_col = F.lit(message) if isinstance(message, str) else message
                clauses.append(VClause(cond, msg_col, error_kind=err))
        elif isinstance(v, CustomValidator):
            if in_hof or scope.in_element:
                raise SpecError(
                    "custom validators inside array-element rules are not "
                    "supported; lift the check to an array-level custom rule"
                )
            marked = _custom_validator_col(v, col, dt, scope)
            tail = F.substring(marked, 3, 2 ** 24)
            clauses.append(VClause(marked.startswith("E:"), tail, error_kind=True))
            clauses.append(VClause(marked.startswith("F:"), tail))
        else:
            raise SpecError("Unknown validator '%r'" % (v,))
    return clauses


def _isin_literals(vals: List[Any], dt: T.DataType) -> List[Any]:
    """Filter literal values to those comparable with the column type, so a
    mixed allowed list (reference allows heterogenous terms) doesn't break
    the typed ``isin``."""
    out = []
    for x in vals:
        if _is_string(dt) and isinstance(x, str):
            out.append(x)
        elif isinstance(dt, T.BooleanType) and isinstance(x, bool):
            out.append(x)
        elif _is_number(dt) and isinstance(x, (int, float)) and not isinstance(x, bool):
            out.append(x)
    return out


def _equal_objects(a: Column, adt: T.DataType, b: Column, bdt: T.DataType) -> Column:
    """is_list_of_equal_objects([A, B]) over map/struct columns
    (/root/reference/src/evv.erl:155-161): same non-empty key set."""
    def keyset(c: Column, dt: T.DataType) -> Optional[Column]:
        if isinstance(dt, T.MapType):
            return F.array_sort(F.map_keys(c))
        if isinstance(dt, T.StructType):
            return F.array([F.lit(f.name) for f in sorted(dt.fields, key=lambda f: f.name)])
        return None

    ka, kb = keyset(a, adt), keyset(b, bdt)
    if ka is None or kb is None:
        return F.lit(False)
    return a.isNotNull() & b.isNotNull() & (F.size(ka) > 0) & (ka == kb)


def _custom_validator_col(
    v: CustomValidator, col: Column, dt: T.DataType, scope: Scope
) -> Column:
    """Compile a custom predicate to an Arrow-batched pandas UDF producing a
    marker string: NULL pass, 'F:msg' false-kind, 'E:msg' error-kind —
    protocol at /root/reference/src/evv.erl:62-84."""

    from pyspark.sql.functions import pandas_udf

    fn, arity, vectorized = v.fn, v.arity, v.vectorized

    def classify(res: Any) -> Optional[str]:
        if res is True:
            return None
        if res is False:
            return "F:" + E.V_ERR_DEFAULT
        if isinstance(res, tuple) and len(res) == 2 and res[0] is False:
            return "F:" + str(res[1])
        if isinstance(res, tuple) and len(res) == 2 and res[0] == "error":
            return "E:" + str(res[1])
        return "E:" + E.ERR_WRONG_FUN

    if arity == 1:

        @pandas_udf("string")
        def _udf(s: pd.Series) -> pd.Series:
            if vectorized:
                try:
                    res = fn(s)
                except EvalidateThrow as ex:
                    return pd.Series(["E:" + str(ex)] * len(s))
                return res.map(classify) if hasattr(res, "map") else pd.Series(
                    [classify(res)] * len(s)
                )

            def one(x: Any) -> Optional[str]:
                if x is None:
                    return None
                try:
                    return classify(fn(x))
                except EvalidateThrow as ex:
                    return "E:" + str(ex)
                except Exception:
                    return "E:" + E.ERR_WRONG_FUN

            return s.map(one)

        return _udf(col)

    # arity 2: value + sibling row data as a struct
    row_struct = scope.get("__row__")

    @pandas_udf("string")
    def _udf2(s: pd.Series, data: pd.Series) -> pd.Series:
        def one(x: Any, d: Any) -> Optional[str]:
            if x is None:
                return None
            try:
                return classify(fn(x, d))
            except EvalidateThrow as ex:
                return "E:" + str(ex)
            except Exception:
                return "E:" + E.ERR_WRONG_FUN

        return pd.Series([one(x, d) for x, d in zip(s, data)])

    return _udf2(col, row_struct)


class EvalidateThrow(Exception):
    """Custom fns raise this to emit an error-kind message, mirroring the
    reference's ``throw({error, Msg})`` protocol
    (suite ``test/evalidate_SUITE.erl:1480-1501``)."""


# --------------------------------------------------------------------------
# converters
# --------------------------------------------------------------------------
@dataclass
class ConvResult:
    out: Column
    out_dtype: T.DataType
    fail: Optional[Column] = None  # convert-crash condition
    custom_err: Optional[Column] = None  # custom {error,Msg} message column


def _compile_converter(
    conv: Any, col: Column, dt: T.DataType, scope: Scope
) -> ConvResult:
    """Converter → output expr + failure condition.  Crash semantics →
    'Couldn't convert …' (/root/reference/src/evalidate.erl:176-178)."""
    if conv is None:
        return ConvResult(col, dt)
    if isinstance(conv, str):
        if conv == "to_int":
            out = col.try_cast("bigint") if not _is_string(dt) else col.try_cast("bigint")
            return ConvResult(out, T.LongType(), fail=col.isNotNull() & out.isNull())
        if conv == "to_float":
            out = col.try_cast("double")
            return ConvResult(out, T.DoubleType(), fail=col.isNotNull() & out.isNull())
        if conv in ("to_binary", "to_list", "to_atom"):
            return ConvResult(_to_string(col, dt), T.StringType())
        if conv == "to_boolean":
            out = col.try_cast("boolean") if not isinstance(dt, T.BooleanType) else col
            return ConvResult(out, T.BooleanType(), fail=col.isNotNull() & out.isNull())
        if conv == "lowercase":
            return ConvResult(F.lower(col), T.StringType())
        if conv == "filter_duplicates":
            if not isinstance(dt, T.ArrayType):
                return ConvResult(col, dt, fail=col.isNotNull())
            elem = dt.elementType
            if isinstance(elem, T.StructType) and elem.fields:
                # dedupe by key (first field), first occurrence wins —
                # /root/reference/src/evalidate.erl:237-248
                k = elem.fields[0].name
                acc0 = F.expr("array()").cast(dt.simpleString())
                out = F.aggregate(
                    col,
                    acc0,
                    lambda acc, x: F.when(
                        F.exists(acc, lambda a: a.getField(k) == x.getField(k)), acc
                    ).otherwise(F.concat(acc, F.array(x))),
                )
                return ConvResult(out, dt)
            return ConvResult(F.array_distinct(col), dt)
        raise SpecError("Wrong converter")
    if isinstance(conv, Each):
        if not isinstance(dt, T.ArrayType):
            return ConvResult(col, dt, fail=col.isNotNull())
        inner = _compile_converter(
            conv.conv, F.lit(None), dt.elementType, scope
        )  # probe for dtype only

        def apply_elem(e: Column) -> Column:
            return _compile_converter(conv.conv, e, dt.elementType, scope).out

        out = F.transform(col, apply_elem)
        fail = F.exists(
            F.zip_with(col, out, lambda i, o: i.isNotNull() & o.isNull()), lambda x: x
        ) if inner.fail is not None else None
        return ConvResult(out, T.ArrayType(inner.out_dtype), fail=fail)
    if isinstance(conv, CustomConverter):
        return _custom_converter(conv, col, dt, scope)
    raise SpecError("Wrong converter")


def _to_string(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    return col.cast("string")


def _custom_converter(conv: CustomConverter, col: Column, dt: T.DataType, scope: Scope) -> ConvResult:

    from pyspark.sql.functions import pandas_udf

    fn, vectorized, arity = conv.fn, conv.vectorized, conv.arity
    out_ddl = "struct<val:%s, err:string>" % conv.out_type

    if arity == 1:

        @pandas_udf(out_ddl)
        def _udf(s: pd.Series) -> pd.DataFrame:
            if vectorized:
                vals = fn(s)
                return pd.DataFrame({"val": vals, "err": [None] * len(s)})

            vals, errs = [], []
            for x in s:
                if x is None:
                    vals.append(None)
                    errs.append(None)
                    continue
                try:
                    r = fn(x)
                    if isinstance(r, tuple) and len(r) == 2 and r[0] == "error":
                        vals.append(None)
                        errs.append(str(r[1]))
                    else:
                        vals.append(r)
                        errs.append(None)
                except Exception:
                    vals.append(None)
                    errs.append("__crash__")
            return pd.DataFrame({"val": vals, "err": errs})

        res = _udf(col)
    else:
        row_struct = scope.get("__row__")

        @pandas_udf(out_ddl)
        def _udf2(s: pd.Series, data: pd.Series) -> pd.DataFrame:
            vals, errs = [], []
            for x, d in zip(s, data):
                if x is None:
                    vals.append(None)
                    errs.append(None)
                    continue
                try:
                    r = fn(x, d)
                    if isinstance(r, tuple) and len(r) == 2 and r[0] == "error":
                        vals.append(None)
                        errs.append(str(r[1]))
                    else:
                        vals.append(r)
                        errs.append(None)
                except Exception:
                    vals.append(None)
                    errs.append("__crash__")
            return pd.DataFrame({"val": vals, "err": errs})

        res = _udf2(col, row_struct)

    from pyspark.sql.types import _parse_datatype_string

    out_dt = _parse_datatype_string(conv.out_type)
    return ConvResult(
        res.getField("val"),
        out_dt,
        fail=res.getField("err") == "__crash__",
        custom_err=F.when(
            res.getField("err").isNotNull() & (res.getField("err") != "__crash__"),
            res.getField("err"),
        ),
    )


def _compile_or_validator(
    v: OrV, col: Column, dt: T.DataType, scope: Scope, in_hof: bool
) -> VClause:
    """Validator-level {'or', conds}: alternatives tried in order; a pass
    wins; an {error,_} propagates; all-false → generic default
    (/root/reference/src/evv.erl:30-36,89-97)."""
    msg: Column = F.lit(E.V_ERR_DEFAULT)
    any_ok = F.lit(False)
    err_msg: Column = F.lit(None).cast("string")
    err_found = F.lit(False)
    for alt in v.alternatives:
        clauses = _compile_validators([alt], col, dt, scope, in_hof=in_hof)
        alt_fail = F.lit(False)
        alt_err_cond = F.lit(False)
        alt_err_msg: Column = F.lit(None).cast("string")
        for cl in clauses:
            c = F.coalesce(cl.cond, F.lit(False))
            if cl.error_kind:
                alt_err_cond = alt_err_cond | (~alt_fail & c)
                alt_err_msg = F.when(~alt_fail & c, cl.message).otherwise(alt_err_msg)
            alt_fail = alt_fail | c
        # error only counts if encountered before this alt passed; once an
        # error alternative is hit the loop stops in the reference
        err_msg = F.when(~err_found & ~any_ok & alt_err_cond, alt_err_msg).otherwise(err_msg)
        err_found = err_found | (~any_ok & alt_err_cond)
        any_ok = any_ok | (~err_found & ~alt_fail)
    cond = ~any_ok
    message = F.when(err_found, err_msg).otherwise(F.lit(E.V_ERR_DEFAULT))
    # error_kind is dynamic here; approximate: treat as false-kind unless an
    # error fired — handled by returning message directly
    return VClause(cond, message)


# --------------------------------------------------------------------------
# rule compilation
# --------------------------------------------------------------------------
def compile_spec(rules: Any, schema: T.StructType, opts: Optional[Options] = None) -> Compiled:
    opts = opts or Options()
    rules = normalize_rules(rules)
    seq = _Seq()
    scope = _root_scope(schema)
    arrays, outputs = _compile_rules(rules, scope, opts, seq)
    outputs = _merge_outputs(outputs)
    viols = F.concat(*arrays) if arrays else _empty_viols()
    if opts.keep_unruled:
        ruled = {o.name for o in outputs}
        for f_ in schema.fields:
            if f_.name not in ruled:
                outputs.append(OutCol(f_.name, F.col("`%s`" % f_.name), f_.dataType))
    return Compiled(violations=viols, outputs=outputs, opts=opts)


def _merge_outputs(outputs: List[OutCol]) -> List[OutCol]:
    """Collapse duplicate output keys the way ``dict(pairs)`` does over the
    reference's proplist: per row, the LAST rule that actually emitted a
    pair for the key wins; keys keep their first position.  Conflicting
    Spark types across duplicates cannot share one typed column — config
    error (documented divergence from the untyped reference)."""
    groups: dict = {}
    order: List[str] = []
    for o in outputs:
        if o.name not in groups:
            order.append(o.name)
        groups.setdefault(o.name, []).append(o)
    merged: List[OutCol] = []
    for name in order:
        occ = groups[name]
        if len(occ) == 1:
            merged.append(occ[0])
            continue
        dts = {o.dtype.simpleString() for o in occ if not isinstance(o.dtype, T.NullType)}
        if len(dts) > 1:
            raise SpecError(
                "conflicting output types for key '%s': %s" % (name, sorted(dts))
            )
        expr: Column = F.lit(None)
        present: Optional[Column] = F.lit(False)
        for o in occ:  # earliest → latest; later wraps earlier as fallback
            if o.present is None:
                expr, present = o.col, None
            else:
                expr = F.when(o.present, o.col).otherwise(expr)
                present = None if present is None else (present | o.present)
        dtype = next((o.dtype for o in occ if not isinstance(o.dtype, T.NullType)), occ[-1].dtype)
        merged.append(OutCol(name, expr, dtype, present))
    return merged


def _root_scope(schema: T.StructType) -> Scope:
    names = {f.name: f.dataType for f in schema.fields}

    def get(k: str) -> Column:
        if k == "__row__":
            return F.struct(*[F.col("`%s`" % f.name) for f in schema.fields])
        if k not in names:
            raise KeyError(k)
        return F.col("`%s`" % k)

    return Scope(get=get, dtype_of=lambda k: names[k], has=lambda k: k in names)


def _struct_scope(parent: Column, dt: T.StructType, parents: Tuple[str, ...], in_element: bool, span_index: Optional[Column]) -> Scope:
    names = {f.name: f.dataType for f in dt.fields}

    def get(k: str) -> Column:
        if k == "__row__":
            return parent
        if k not in names:
            raise KeyError(k)
        return parent.getField(k)

    return Scope(
        get=get,
        dtype_of=lambda k: names[k],
        has=lambda k: k in names,
        parents=parents,
        in_element=in_element,
        span_index=span_index,
    )


def _map_scope(
    parent: Column,
    dt: T.MapType,
    parents: Tuple[str, ...],
    in_element: bool,
    span_index: Optional[Column],
) -> Scope:
    """Scope over a MapType value — the reference's fully-dynamic proplist
    (``/root/reference/src/evalidate.erl:114``): any key resolves
    (``has`` is always true) to ``try_element_at(map, key)``, typed as the
    map's value type.

    Presence note (SURVEY §2.3 P1): an absent key and a key mapped to NULL
    are both "missing" — exactly the reference, where a proplist value of
    ``undefined`` is what ``get_value`` returns for an absent key too, so
    ``try_element_at(..).isNull()`` ≡ ``~map_contains_key ∨ value IS NULL``
    is the parity-correct presence test."""
    vt = dt.valueType

    def get(k: str) -> Column:
        if k == "__row__":
            return parent
        return F.try_element_at(parent, F.lit(k))

    return Scope(
        get=get,
        dtype_of=lambda k: vt,
        has=lambda k: True,
        parents=parents,
        in_element=in_element,
        span_index=span_index,
    )


def _child_scope(
    val: Column,
    dt: T.DataType,
    parents: Tuple[str, ...],
    in_element: bool,
    span_index: Optional[Column],
) -> Optional[Scope]:
    """Scope for recursing childs into a struct (fixed keys) or map
    (dynamic keys) value; None if the type cannot host childs."""
    if isinstance(dt, T.StructType):
        return _struct_scope(val, dt, parents, in_element, span_index)
    if isinstance(dt, T.MapType) and isinstance(dt.keyType, T.StringType):
        return _map_scope(val, dt, parents, in_element, span_index)
    return None


def _key_path(key: Optional[str], scope: Scope, opts: Options) -> str:
    if not opts.parent_key or not scope.parents:
        return key if key is not None else ""
    parts = list(scope.parents) + ([key] if key is not None else [])
    return ".".join(parts)


def _compile_rules(
    rules: Sequence[Any], scope: Scope, opts: Options, seq: _Seq
) -> Tuple[List[Column], List[OutCol]]:
    arrays: List[Column] = []
    outputs: List[OutCol] = []
    for node in rules:
        if isinstance(node, Rule):
            keys: List[Optional[str]]
            if node.key is None:
                keys = [None]
            elif isinstance(node.key, str):
                keys = [node.key]
            else:
                keys = list(node.key)
            for k in keys:
                arr, outs = _compile_rule(replace(node, key=k), scope, opts, seq)
                arrays.append(arr)
                outputs.extend(outs)
        elif isinstance(node, RuleAnd):
            sub_arrays, sub_outputs = _compile_rules(list(node.rules), scope, opts, seq)
            combined = F.concat(*sub_arrays) if sub_arrays else _empty_viols()
            if node.on_error is not None:
                s = seq.next()
                entry = F.when(
                    F.size(combined) > 0,
                    _viol_struct(s, "rule_and", None, F.lit(node.on_error), None,
                                 scope.span_index),
                )
                arrays.append(_entry_array(entry))
            else:
                arrays.append(combined)
            outputs.extend(sub_outputs)
        elif isinstance(node, RuleOr):
            arrays.append(_compile_rule_or(node, scope, opts, seq, outputs))
        else:
            raise SpecError("Unknown rule(s) '%r'" % (node,))
    return arrays, outputs


def _compile_rule_or(
    node: RuleOr, scope: Scope, opts: Options, seq: _Seq, outputs: List[OutCol]
) -> Column:
    """First passing alternative wins; all-fail → first-error messages of
    each alternative deduped + joined ' or ' in reverse trial order
    (/root/reference/src/evalidate.erl:74-84,251-265).  Output columns:
    alternatives usually target the same key; we emit each alternative's
    outputs guarded by that alternative being the winner."""
    s = seq.next()
    alt_viols: List[Column] = []
    alt_outs: List[List[OutCol]] = []
    for alt in node.rules:
        sub_arrays, sub_outputs = _compile_rules([alt], scope, opts, seq)
        av = F.concat(*sub_arrays) if sub_arrays else _empty_viols()
        alt_viols.append(av)
        alt_outs.append(sub_outputs)

    fails = [F.size(v) > 0 for v in alt_viols]
    # winner = first passing alternative (reference tries them in order,
    # /root/reference/src/evalidate.erl:251-259)
    wins: List[Column] = []
    prior_fail: Column = F.lit(True)
    for f_ in fails:
        wins.append(prior_fail & ~f_)
        prior_fail = prior_fail & f_
    all_fail = prior_fail

    if node.on_error is not None:
        message: Column = F.lit(node.on_error)
    else:
        first_msgs = [F.try_element_at(v, F.lit(1)).getField("message") for v in alt_viols]
        message = F.array_join(
            F.array_distinct(F.reverse(F.array(*first_msgs))), " or "
        )
    entry = F.when(
        all_fail, _viol_struct(s, "rule_or", None, message, None, scope.span_index)
    )

    # winner-guarded outputs: only the WINNING alternative's outputs appear
    # (the oracle returns the first passing alternative's pairs alone)
    names = []
    for outs in alt_outs:
        for o in outs:
            if o.name not in names:
                names.append(o.name)
    for name in names:
        dtype: T.DataType = T.NullType()
        chain = None
        present: Column = F.lit(False)
        for win, outs in zip(wins, alt_outs):
            match = [o for o in outs if o.name == name]
            if not match:
                continue
            o = match[0]
            dtype = o.dtype
            emitted = win if o.present is None else (win & o.present)
            chain = F.when(emitted, o.col) if chain is None else chain.when(emitted, o.col)
            present = present | emitted
        if chain is not None:
            outputs.append(OutCol(name, chain, dtype, present))
    return _entry_array(entry)


def _compile_rule(
    rule: Rule, scope: Scope, opts: Options, seq: _Seq
) -> Tuple[Column, List[OutCol]]:
    """One #rule: presence → validators → childs → convert
    (/root/reference/src/evalidate.erl:112-161)."""
    s = seq.next()
    key = rule.key
    rule_id = "rule:%s" % (key if key is not None else "<top>")
    kp = _key_path(key, scope, opts)
    kp_col = F.lit(kp if kp else None)

    # ---- resolve value
    if key is None:
        val = scope.get("__row__")
        dt: T.DataType = T.StructType()  # synthetic; validators on whole row
        # top-level rule: presence is irrelevant (the row always exists)
        missing_static = False
    elif scope.has(key):
        val = scope.get(key)
        dt = scope.dtype_of(key)
        missing_static = False
    else:
        val, dt = F.lit(None), T.NullType()
        missing_static = True

    entries: List[Column] = []
    outs: List[OutCol] = []

    # ---- presence (/root/reference/src/evalidate.erl:112-128)
    if missing_static:
        if rule.presence == REQUIRED:
            entries.append(
                _entry_array(
                    _viol_struct(
                        s, rule_id, kp_col, F.lit(E.key_required_msg(kp)), None,
                        scope.span_index,
                    ).alias("v")
                )
            )
        elif isinstance(rule.presence, Default):
            outs.append(_lit_out(key, rule.presence.value))
        return (
            F.concat(*entries) if entries else _empty_viols(),
            outs,
        )

    is_missing = val.isNull() if key is not None else F.lit(False)

    if rule.presence == REQUIRED:
        entries.append(
            _entry_array(
                F.when(
                    is_missing,
                    _viol_struct(
                        s, rule_id, kp_col, F.lit(E.key_required_msg(kp)), None,
                        scope.span_index,
                    ),
                )
            )
        )
    elif rule.presence == DEPRECATED:
        # present → deprecated error; message uses the bare key
        # (/root/reference/src/evalidate.erl:123-124)
        entries.append(
            _entry_array(
                F.when(
                    ~is_missing,
                    _viol_struct(
                        s, rule_id, kp_col,
                        F.lit(E.key_deprecated_msg(str(key))), None, scope.span_index,
                    ),
                )
            )
        )
        return F.concat(*entries), []  # deprecated keys never reach output

    # ---- validators
    present = ~is_missing
    if rule.validators:
        clauses = _compile_validators(list(rule.validators), val, dt, scope)
        chain: Optional[Column] = None
        for cl in clauses:
            msg = cl.message
            if rule.on_error is not None and not cl.error_kind:
                msg = _render_on_error(rule.on_error, kp if key is not None else "none", val, dt)
            cond = present & F.coalesce(cl.cond, F.lit(False))
            chain = F.when(cond, msg) if chain is None else chain.when(cond, msg)
        if chain is not None:
            vrepr = c_maybe_cut(c_unscriptize(c_ts_repr(val, dt)))
            entries.append(
                _entry_array(
                    F.when(
                        chain.isNotNull(),
                        _viol_struct(s, rule_id, kp_col, chain, vrepr, scope.span_index),
                    )
                )
            )

    # ---- childs (/root/reference/src/evalidate.erl:145-155)
    child_struct_out: Optional[Column] = None
    child_struct_dt: Optional[T.DataType] = None
    if rule.childs:
        cscope = _child_scope(
            val, dt, scope.parents + ((key,) if key else ()), scope.in_element,
            scope.span_index,
        )
        if cscope is not None:  # struct (fixed keys) or map (dynamic keys)
            carrays, couts = _compile_rules(list(rule.childs), cscope, opts, seq)
            child_v = F.concat(*carrays) if carrays else _empty_viols()
            entries.append(F.when(present, child_v).otherwise(_empty_viols()))
            if couts:
                child_struct_out = F.when(
                    present, F.struct(*[o.col.alias(o.name) for o in couts])
                )
                child_struct_dt = T.StructType(
                    [T.StructField(o.name, o.dtype) for o in couts]
                )
        elif isinstance(dt, T.ArrayType) and (
            isinstance(dt.elementType, T.StructType)
            or (
                isinstance(dt.elementType, T.MapType)
                and isinstance(dt.elementType.keyType, T.StringType)
            )
        ):
            edt = dt.elementType
            parents = scope.parents + ((key,) if key else ())
            carr, conv_elem, conv_dt = _compile_element_rules(
                list(rule.childs), val, edt, parents, opts, seq
            )
            entries.append(F.when(present, carr).otherwise(_empty_viols()))
            if conv_elem is not None:
                child_struct_out = F.when(present, conv_elem)
                child_struct_dt = T.ArrayType(conv_dt)
        else:
            # wrong childs (/root/reference/src/evalidate.erl:153-155)
            entries.append(
                _entry_array(
                    F.when(
                        present,
                        _viol_struct(
                            s, rule_id, kp_col,
                            F.lit(E.TPL_WRONG_CHILDS.format(key=kp)), None,
                            scope.span_index,
                        ),
                    )
                )
            )

    # ---- converter (/root/reference/src/evalidate.erl:157-206)
    if rule.converter == "no_return":
        pass  # key dropped from output
    else:
        conv_in = child_struct_out if child_struct_out is not None else val
        conv_dt_in = child_struct_dt if child_struct_dt is not None else dt
        cres = _compile_converter(rule.converter, conv_in, conv_dt_in, scope)
        if cres.fail is not None:
            vrepr_ts = c_ts_repr(val, dt)
            msg = F.concat(
                F.lit("Couldn't convert value '"),
                vrepr_ts,
                F.lit("' for key '%s' " % (key if key is not None else "none")),
            )
            entries.append(
                _entry_array(
                    F.when(
                        present & F.coalesce(cres.fail, F.lit(False)),
                        _viol_struct(s, rule_id, kp_col, msg, None, scope.span_index),
                    )
                )
            )
        if cres.custom_err is not None:
            entries.append(
                _entry_array(
                    F.when(
                        present & cres.custom_err.isNotNull(),
                        _viol_struct(s, rule_id, kp_col, cres.custom_err, None,
                                     scope.span_index),
                    )
                )
            )
        out_expr = cres.out
        out_dt = cres.out_dtype
        if isinstance(rule.presence, Default):
            if not _default_fits(rule.presence.value, out_dt):
                # the reference injects any term untyped; a Spark column is
                # typed, so a mismatched default is a config error caught at
                # compile time (mirroring the reference's config-error
                # philosophy, /root/reference/src/evv.erl:86-87)
                raise SpecError(
                    "default %r does not fit output type %s for key '%s'"
                    % (rule.presence.value, out_dt.simpleString(), key)
                )
            out_expr = F.when(is_missing, F.lit(rule.presence.value)).otherwise(out_expr)
        # optional-without-default + missing value → the reference emits no
        # pair for this key (it can be shadowed by an earlier rule's pair)
        pair_present = (
            ~is_missing
            if (rule.presence == OPTIONAL and key is not None)
            else None
        )
        if key is not None:
            outs.append(OutCol(key, out_expr, out_dt, pair_present))
        else:
            # top-level rule: converted whole-row struct exposed as _root
            outs.append(OutCol("_root", out_expr, out_dt))

    viols = F.concat(*entries) if entries else _empty_viols()
    return viols, outs


def _default_fits(value: Any, dt: T.DataType) -> bool:
    """Can *value* be injected as a literal into a column of type *dt*
    without a lossy/failing cast?"""
    if value is None or isinstance(dt, T.NullType):
        return True
    if isinstance(value, bool):
        return isinstance(dt, T.BooleanType)
    if isinstance(value, int):
        return _is_number(dt)
    if isinstance(value, float):
        return _is_float(dt)
    if isinstance(value, str):
        return _is_string(dt)
    if isinstance(value, (list, tuple)):
        return isinstance(dt, T.ArrayType) and all(
            _default_fits(v, dt.elementType) for v in value
        )
    if isinstance(value, dict):
        return isinstance(dt, (T.MapType, T.StructType))
    return False


def _lit_out(key: str, value: Any) -> OutCol:
    lit = F.lit(value)
    if isinstance(value, bool):
        return OutCol(key, lit, T.BooleanType())
    if isinstance(value, int):
        return OutCol(key, lit, T.LongType())
    if isinstance(value, float):
        return OutCol(key, lit, T.DoubleType())
    return OutCol(key, lit, T.StringType())


def _render_on_error(template: str, key: str, val: Column, dt: T.DataType) -> Column:
    """on_validate_error template → Column concat
    (/root/reference/src/evalidate.erl:214-223)."""
    t = template.replace("{{key}}", E.unscriptize(key))
    parts = t.split("{{value}}")
    if len(parts) == 1:
        return F.lit(t)
    vrepr = c_unscriptize(c_ts_repr(val, dt))
    cols: List[Column] = []
    for i, p in enumerate(parts):
        if i:
            cols.append(vrepr)
        if p:
            cols.append(F.lit(p))
    return F.concat(*cols) if cols else F.lit("")


def _compile_element_rules(
    childs: Sequence[Any],
    arr: Column,
    edt: T.DataType,
    parents: Tuple[str, ...],
    opts: Options,
    seq: _Seq,
) -> Tuple[Column, Optional[Column], T.DataType]:
    """Child rules mapped over every element of an array<struct> (the spans
    pattern — reference 'rules over object lists',
    /root/reference/src/evalidate.erl:48-49, suite :1231-1279) or
    array<map<string,_>> (dynamic-key objects).

    Explode-free: one `transform` with an index lambda produces per-element
    violation arrays, flattened into the row's violations.  Catalyst keeps
    this in the same fused projection."""
    # pre-allocate seq numbers by compiling once against a dummy scope so
    # numbering matches depth-first order deterministically
    start = seq.n

    def build(e: Column, i: Column) -> Column:
        local = _Seq()
        local.n = start
        escope = _child_scope(e, edt, parents, True, i.cast("int"))
        arrays, _ = _compile_rules(list(childs), escope, opts, local)
        return F.concat(*arrays) if arrays else _empty_viols()

    viols = F.flatten(F.transform(arr, lambda e, i: build(e, i)))

    # advance the shared counter to account for the element rules
    probe = _Seq()
    probe.n = start
    dummy_scope = _child_scope(F.lit(None).cast(edt.simpleString()), edt, parents, True, None)
    _, probe_outs = _compile_rules(list(childs), dummy_scope, opts, probe)
    seq.n = probe.n

    conv_elem: Optional[Column] = None
    conv_dt: T.DataType = edt
    if probe_outs:

        def conv_one(e: Column) -> Column:
            local = _Seq()
            local.n = start
            escope = _child_scope(e, edt, parents, True, None)
            _, outs = _compile_rules(list(childs), escope, opts, local)
            return F.struct(*[o.col.alias(o.name) for o in outs])

        conv_elem = F.transform(arr, conv_one)
        conv_dt = T.StructType([T.StructField(o.name, o.dtype) for o in probe_outs])
    return viols, conv_elem, conv_dt
