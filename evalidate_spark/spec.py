"""Declarative rule-spec model.

Mirrors the reference rule DSL (``/root/reference/include/evalidate.hrl:11-31``):
``#rule{key, presence, validators, converter, childs, on_validate_error}`` plus
the ``#rule_and`` / ``#rule_or`` combinators.  The spec is *data*: it is
validated eagerly (reference raises structured config errors for unknown
validators/types, ``/root/reference/src/evv.erl:86-87,124-125``) and compiled
on the driver into native Spark ``Column`` expressions by
:mod:`evalidate_spark.compiler`.

Design stance (SURVEY.md §7): the engine is a spec *compiler*, not an
interpreter.  Nothing in this module touches Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, Union

__all__ = [
    "SpecError",
    "REQUIRED",
    "OPTIONAL",
    "DEPRECATED",
    "Default",
    "Type",
    "Size",
    "Regexp",
    "Allowed",
    "OrV",
    "EqualToObjectOfOtherKeys",
    "CustomValidator",
    "Native",
    "Converter",
    "Each",
    "CustomConverter",
    "Rule",
    "RuleAnd",
    "RuleOr",
    "RuleSpec",
    "INFINITY",
    "TYPE_NAMES",
    "CONVERTER_NAMES",
    "normalize_rules",
]


class SpecError(ValueError):
    """Raised at compile time for malformed rule specs.

    Mirrors the reference's config-error throws: unknown validator
    (``/root/reference/src/evv.erl:86-87``), unknown type validator
    (``/root/reference/src/evv.erl:124-125``), unknown rule
    (``/root/reference/src/evalidate.erl:61-62,70-71``).
    """


# ---------------------------------------------------------------- presence
REQUIRED = "required"
OPTIONAL = "optional"
DEPRECATED = "deprecated"


@dataclass(frozen=True)
class Default:
    """``{optional, Default}`` presence — missing value gets *value*,
    with validators and converter skipped
    (``/root/reference/src/evalidate.erl:117``)."""

    value: Any


Presence = Union[str, Default]

# ---------------------------------------------------------------- validators
INFINITY = None  # open bound, reference atom `infinity`

# `type()` union at /root/reference/include/evalidate.hrl:43
TYPE_NAMES = frozenset(
    {
        "binary",
        "list",
        "uniq_list",
        "tuple",
        "boolean",
        "integer",
        "atom",
        "float",
        "number",
        "list_of_equal_objects",
    }
)


@dataclass(frozen=True)
class Type:
    """``{type, T}`` — T is a type name, a union list of type names, or
    ``("list", [elem_validators])`` (``/root/reference/src/evv.erl:100-125``)."""

    of: Any  # str | Sequence[str] | tuple ("list", [validators])

    def __post_init__(self) -> None:
        _check_type_cond(self.of)


def _check_type_cond(cond: Any) -> None:
    if isinstance(cond, str):
        if cond not in TYPE_NAMES:
            raise SpecError("Unknown type validator '%s'" % cond)
        return
    if isinstance(cond, tuple) and len(cond) == 2 and cond[0] == "list":
        for v in cond[1]:
            _check_validator(v)
        return
    if isinstance(cond, (list, tuple)):
        for t in cond:
            _check_type_cond(t)
        return
    raise SpecError("Unknown type validator '%r'" % (cond,))


@dataclass(frozen=True)
class Size:
    """``{size, {From, To}}`` — string → unicode char count, array → length,
    number → the value itself (``/root/reference/src/evv.erl:164-184``).
    ``None`` bound = reference atom ``infinity`` (open end)."""

    min: Optional[int]
    max: Optional[int]

    def __post_init__(self) -> None:
        for b in (self.min, self.max):
            if b is not None and not isinstance(b, int):
                raise SpecError("size bounds must be int or None (infinity)")


@dataclass(frozen=True)
class Regexp:
    """``{regexp, R}`` — unanchored contains-match like ``re:run``
    (``/root/reference/src/evv.erl:187-194``).  Java regex syntax."""

    pattern: str


@dataclass(frozen=True)
class Allowed:
    """``{allowed, L}`` / ``{allowed_values, L}`` set membership
    (``/root/reference/src/evv.erl:49-54``)."""

    values: Sequence[Any]


@dataclass(frozen=True)
class OrV:
    """Validator-level ``{'or', [conds]}`` — any one validator list passes;
    on all-fail the message is the generic default
    (``/root/reference/src/evv.erl:30-36,89-97``)."""

    alternatives: Sequence[Any]  # sequence of validators (each tried alone)


@dataclass(frozen=True)
class EqualToObjectOfOtherKeys:
    """Cross-field, row-local: value's key-set equals the key-set of the
    object(s) under *keys* in the same row
    (``/root/reference/src/evv.erl:55-60,155-161``).  Not a join."""

    keys: Sequence[str]


@dataclass(frozen=True)
class Native:
    """A validator backed by a compile-time builder producing native Column
    clauses — how the library validators (``include/evalidate_lib.hrl``) are
    re-expressed JVM-side instead of as per-row funs.

    ``build(col, dtype) -> list[(fail_cond, message, error_kind)]`` where
    message is a str or Column.  Created via :mod:`evalidate_spark.lib`.
    """

    name: str
    build: Callable[..., Any]
    oracle: Optional[Callable[..., Any]] = None  # pure-python twin for the oracle
    params: Sequence[Any] = ()  # constructor args, for JSON round-trip


@dataclass(frozen=True)
class CustomValidator:
    """Custom predicate (reference fun/1 & fun/2,
    ``/root/reference/src/evv.erl:62-84``).

    ``fn`` operates on a scalar value (arity 1) or ``(value, row_dict)``
    (arity 2) and returns ``True`` | ``False`` | ``(False, msg)`` |
    raises — the reference protocol.  Compiled to an Arrow-batched pandas
    UDF (never per-row Python on the executor hot path: the scalar fn is
    mapped over a pandas Series inside one Arrow batch).

    For full vectorization pass ``vectorized=True`` and a fn taking
    ``pandas.Series`` (arity 1) or ``(pandas.Series, pandas.DataFrame)``
    (arity 2) returning a Series of ``True | False | (False, msg)``.
    """

    fn: Callable[..., Any]
    arity: int = 1
    vectorized: bool = False
    name: str = "custom"

    def __post_init__(self) -> None:
        if self.arity not in (1, 2):
            raise SpecError("CustomValidator arity must be 1 or 2")


Validator = Union[
    Type, Size, Regexp, Allowed, OrV, EqualToObjectOfOtherKeys, CustomValidator, Native
]


def _check_validator(v: Any) -> None:
    if isinstance(
        v,
        (Type, Size, Regexp, Allowed, OrV, EqualToObjectOfOtherKeys, CustomValidator, Native),
    ):
        if isinstance(v, OrV):
            for alt in v.alternatives:
                _check_validator(alt)
        return
    raise SpecError("Unknown validator '%r'" % (v,))


# ---------------------------------------------------------------- converters
CONVERTER_NAMES = frozenset(
    {
        "to_int",
        "to_list",
        "to_atom",
        "to_float",
        "to_binary",
        "to_boolean",
        "filter_duplicates",
        "no_return",
        "lowercase",  # ?C_LOWERCASE, /root/reference/include/evalidate_lib.hrl:132
    }
)


@dataclass(frozen=True)
class Each:
    """``{each, Conv}`` — map converter over list elements
    (``/root/reference/src/evalidate.erl:192-193``)."""

    conv: Any


@dataclass(frozen=True)
class CustomConverter:
    """Custom transform (reference fun/1 & fun/2 converters,
    ``/root/reference/src/evalidate.erl:194-203``).  Compiled to an
    Arrow-batched pandas UDF.  ``out_type`` is the Spark DDL type of the
    result (e.g. ``"string"``, ``"bigint"``)."""

    fn: Callable[..., Any]
    out_type: str = "string"
    arity: int = 1
    vectorized: bool = False
    name: str = "custom"


Converter = Union[str, Each, CustomConverter, None]


def _check_converter(c: Any) -> None:
    if c is None:
        return
    if isinstance(c, str):
        if c not in CONVERTER_NAMES:
            raise SpecError("Wrong converter")
        return
    if isinstance(c, Each):
        _check_converter(c.conv)
        return
    if isinstance(c, CustomConverter):
        return
    raise SpecError("Wrong converter")


# ---------------------------------------------------------------- rules
@dataclass(frozen=True)
class Rule:
    """One field rule (reference ``#rule``,
    ``/root/reference/include/evalidate.hrl:11-17``).

    ``key=None`` → top-level rule over the whole row
    (``/root/reference/src/evalidate.erl:99-100``).
    ``key=[k1, k2]`` → rule expanded over each key
    (``/root/reference/src/evalidate.erl:101-107``).
    """

    key: Union[None, str, Sequence[str]] = None
    presence: Presence = REQUIRED
    validators: Sequence[Validator] = field(default_factory=tuple)
    converter: Converter = None
    childs: Sequence["RuleNode"] = field(default_factory=tuple)
    on_error: Optional[str] = None  # on_validate_error template, {{key}}/{{value}}

    def __post_init__(self) -> None:
        # normalise the reference's literal {optional, Default} tuple shape
        if (
            isinstance(self.presence, tuple)
            and len(self.presence) == 2
            and self.presence[0] == OPTIONAL
        ):
            object.__setattr__(self, "presence", Default(self.presence[1]))
        if isinstance(self.presence, str):
            if self.presence not in (REQUIRED, OPTIONAL, DEPRECATED):
                raise SpecError("Unknown presence '%s'" % self.presence)
        elif not isinstance(self.presence, Default):
            raise SpecError("Unknown presence %r" % (self.presence,))
        for v in self.validators or ():
            _check_validator(v)
        _check_converter(self.converter)


@dataclass(frozen=True)
class RuleAnd:
    """All sub-rules must pass; ``on_error`` replaces member messages
    (``/root/reference/src/evalidate.erl:87-95``)."""

    rules: Sequence["RuleNode"]
    on_error: Optional[str] = None


@dataclass(frozen=True)
class RuleOr:
    """First passing alternative wins; on all-fail the member errors are
    deduped and joined with ``" or "`` in *reverse* trial order
    (``/root/reference/src/evalidate.erl:74-84,251-265``)."""

    rules: Sequence["RuleNode"]
    on_error: Optional[str] = None


RuleNode = Union[Rule, RuleAnd, RuleOr]
RuleSpec = Sequence[RuleNode]


def normalize_rules(rules: Any) -> list:
    """Accept a single node or a sequence; reject anything else with the
    reference's unknown-rule config error
    (``/root/reference/src/evalidate.erl:61-62``)."""
    if isinstance(rules, (Rule, RuleAnd, RuleOr)):
        return [rules]
    if isinstance(rules, (list, tuple)):
        out = []
        for r in rules:
            if not isinstance(r, (Rule, RuleAnd, RuleOr)):
                raise SpecError("Unknown rule(s) '%r'" % (r,))
            out.append(r)
        return out
    raise SpecError("Unknown rule(s) '%r'" % (rules,))
