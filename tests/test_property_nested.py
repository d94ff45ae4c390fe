"""Property-based parity for NESTED rules: childs over struct columns and
over array<struct> element lists (the spans shape), against the oracle."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

import pytest

from evalidate_spark.spec import Allowed, Default, Rule, Size, Type
from tests.helpers import assert_parity

SCHEMA = (
    "obj struct<a string, b bigint>, "
    "items array<struct<kind string, off bigint>>"
)

OBJS = st.sampled_from(
    [None, {"a": "x", "b": 1}, {"a": None, "b": 2}, {"a": "long" * 40, "b": None}]
)
ITEMS = st.sampled_from(
    [
        None,
        [],
        [{"kind": "text", "off": 0}],
        [{"kind": "text", "off": 0}, {"kind": "media", "off": 5}],
        [{"kind": "bogus", "off": -3}, {"kind": None, "off": 7}],
        [{"kind": "text", "off": None}] * 3,
    ]
)
ROW = st.fixed_dictionaries({"obj": OBJS, "items": ITEMS})

CHILD_A = st.builds(
    Rule,
    key=st.just("a"),
    presence=st.sampled_from(["required", "optional", Default("d")]),
    validators=st.lists(
        st.one_of(st.builds(Type, st.just("binary")), st.builds(Size, st.just(1), st.just(10))),
        max_size=1,
    ),
)
CHILD_B = st.builds(
    Rule,
    key=st.just("b"),
    presence=st.sampled_from(["required", "optional"]),
    validators=st.lists(st.builds(Size, st.just(0), st.just(5)), max_size=1),
)
CHILD_KIND = st.builds(
    Rule,
    key=st.just("kind"),
    presence=st.sampled_from(["required", "optional"]),
    validators=st.lists(st.builds(Allowed, st.just(["text", "media"])), max_size=1),
)
CHILD_OFF = st.builds(
    Rule,
    key=st.just("off"),
    presence=st.sampled_from(["required", "optional"]),
    validators=st.lists(st.builds(Size, st.just(0), st.just(100)), max_size=1),
)

RULES = st.lists(
    st.one_of(
        st.builds(
            Rule,
            key=st.just("obj"),
            presence=st.sampled_from(["required", "optional"]),
            childs=st.lists(st.one_of(CHILD_A, CHILD_B), min_size=1, max_size=2),
        ),
        st.builds(
            Rule,
            key=st.just("items"),
            presence=st.sampled_from(["required", "optional"]),
            validators=st.lists(st.builds(Size, st.just(1), st.just(10)), max_size=1),
            childs=st.lists(st.one_of(CHILD_KIND, CHILD_OFF), min_size=1, max_size=2),
        ),
    ),
    min_size=1,
    max_size=2,
)


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(rules=RULES, rows=st.lists(ROW, min_size=8, max_size=8))
def test_nested_engine_matches_oracle(spark_holder, rules, rows):
    from evalidate_spark.spec import SpecError

    try:
        assert_parity(spark_holder, rules, rows, SCHEMA)
    except SpecError:
        pass


# ---- doubly-nested: array<struct> childs inside array<struct> childs ----
DEEP_SCHEMA = "docs array<struct<name string, inner array<struct<kind string, v bigint>>>>"

INNERS = st.sampled_from(
    [
        None,
        [],
        [{"kind": "text", "v": 1}],
        [{"kind": "bogus", "v": 2}, {"kind": "media", "v": None}],
        [{"kind": None, "v": 200}],
    ]
)
DOCS = st.lists(
    st.fixed_dictionaries(
        {"name": st.sampled_from([None, "a", "b" * 5]), "inner": INNERS}
    ),
    max_size=3,
).map(lambda d: d or None)

DEEP_RULES = st.lists(
    st.builds(
        Rule,
        key=st.just("docs"),
        presence=st.sampled_from(["required", "optional"]),
        childs=st.tuples(
            st.builds(
                Rule,
                key=st.just("name"),
                presence=st.sampled_from(["required", "optional"]),
                validators=st.lists(st.builds(Size, st.just(1), st.just(3)), max_size=1),
            ),
            st.builds(
                Rule,
                key=st.just("inner"),
                presence=st.sampled_from(["required", "optional"]),
                childs=st.tuples(
                    st.builds(
                        Rule,
                        key=st.just("kind"),
                        validators=st.lists(
                            st.builds(Allowed, st.just(["text", "media"])), max_size=1
                        ),
                    ),
                    st.builds(
                        Rule,
                        key=st.just("v"),
                        presence=st.sampled_from(["required", "optional"]),
                        validators=st.lists(
                            st.builds(Size, st.just(0), st.just(100)), max_size=1
                        ),
                    ),
                ),
            ),
        ),
    ),
    min_size=1,
    max_size=1,
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(rules=DEEP_RULES, rows=st.lists(st.fixed_dictionaries({"docs": DOCS}), min_size=6, max_size=6))
def test_doubly_nested_engine_matches_oracle(spark_holder, rules, rows):
    from evalidate_spark.spec import SpecError

    try:
        assert_parity(spark_holder, rules, rows, DEEP_SCHEMA)
    except SpecError:
        pass
