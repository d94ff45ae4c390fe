"""Property-based engine ↔ oracle parity: hypothesis generates rule-specs
and rows; every example must agree with the pure-Python reference oracle on
pass/fail, first-error message, key path, and converted outputs.

Derandomized (fixed seed) and bounded: each example validates a 10-row
DataFrame, so the whole property run is a handful of Spark jobs.
"""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from evalidate_spark.spec import Allowed, Default, Each, Regexp, Rule, RuleOr, Size, Type
from tests.helpers import assert_parity

SCHEMA = "s string, n bigint, f double, b boolean, arr array<string>"

STRINGS = st.sampled_from(
    [None, "", "abc", "ABC def", "123", "-42", "1.5", "x" * 150, "Кирилицо", "a<b>c"]
)
INTS = st.sampled_from([None, 0, 1, -7, 100, 10**12])
FLOATS = st.sampled_from([None, 0.0, 1.5, -2.25, 1e6])
BOOLS = st.sampled_from([None, True, False])
ARRS = st.sampled_from(
    [None, [], ["a"], ["a", "b", "a"], ["UP", "low", "UP"], ["x" * 5] * 4]
)

ROW = st.fixed_dictionaries(
    {"s": STRINGS, "n": INTS, "f": FLOATS, "b": BOOLS, "arr": ARRS}
)

TYPE_CONDS = st.sampled_from(
    ["binary", "list", "integer", "float", "number", "boolean", "uniq_list",
     ["integer", "binary"]]
)

# Default values typed to the raw column (a mismatched default is a
# compile-time SpecError — our documented Spark-data-model adaptation)
DEFAULTS = {"s": "dflt", "n": 7, "f": 1.25, "b": True, "arr": ["d"], "ghost": "g"}


def presence_for(key):
    return st.sampled_from(["required", "optional", Default(DEFAULTS[key]), "deprecated"])


def validators_for(key):
    vs = [st.builds(Type, TYPE_CONDS), st.builds(Allowed, st.just(["abc", "123", 1, True]))]
    if key in ("s", "n", "f", "arr"):
        vs.append(st.builds(Size, st.sampled_from([None, 0, 2]), st.sampled_from([None, 3, 100])))
    if key == "s":
        vs.append(st.builds(Regexp, st.sampled_from([r"^\d+$", "abc", r"^[A-Z]"])))
    return st.lists(st.one_of(*vs), min_size=0, max_size=2)


def converter_for(key):
    opts = [None, "to_binary"]
    if key == "s":
        opts += ["lowercase", "to_int"]
    if key == "n":
        opts += ["to_int", "to_float"]
    if key == "arr":
        return st.sampled_from([None, "filter_duplicates", Each("lowercase")])
    return st.sampled_from(opts)


def rule_for(key):
    return st.builds(
        Rule,
        key=st.just(key),
        presence=presence_for(key),
        validators=validators_for(key),
        converter=converter_for(key),
    )


KEYS = ["s", "n", "f", "b", "arr", "ghost"]

RULES = st.lists(
    st.one_of(
        *[rule_for(k) for k in KEYS],
        st.builds(
            RuleOr,
            rules=st.tuples(rule_for("s"), rule_for("n")).map(list),
        ),
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(rules=RULES, rows=st.lists(ROW, min_size=10, max_size=10))
def test_engine_matches_oracle(spark_session_holder, rules, rows):
    from evalidate_spark.spec import SpecError

    try:
        assert_parity(spark_session_holder, rules, rows, SCHEMA)
    except SpecError:
        # a converter changed the output type out from under a Default —
        # compile-time config error by design; not a parity case
        pass


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis re-enters the test many times; reuse the session fixture
    return spark
