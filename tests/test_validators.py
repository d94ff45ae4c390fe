"""Validator parity tests, transliterated from the reference suite's
``validators`` group (``/root/reference/test/evalidate_SUITE.erl:214-641``)."""

from evalidate_spark.spec import (
    Allowed,
    CustomValidator,
    EqualToObjectOfOtherKeys,
    OrV,
    Regexp,
    Rule,
    Size,
    Type,
)
from helpers import assert_parity


def test_type_validators_good(spark):
    # suite :214-249 (typed columns; tuple/atom legs live in oracle-only tests)
    rules = [
        Rule(key="Key", validators=[Type("binary")]),
        Rule(key="list", validators=[Type("list")]),
        Rule(key="boolean", validators=[Type("boolean")]),
        Rule(key="integer", validators=[Type("integer")]),
        Rule(key="unique_list", validators=[Type("uniq_list")]),
        Rule(key="atom", validators=[Type(["binary", "atom"])]),
    ]
    rows = [
        {
            "Key": "12566554",
            "list": [1, 2, 3, 4],
            "boolean": True,
            "integer": 1,
            "unique_list": [1, 4, 7],
            "atom": "atom",
        }
    ]
    schema = "Key string, list array<int>, boolean boolean, integer bigint, unique_list array<int>, atom string"
    assert_parity(spark, rules, rows, schema)


def test_type_validators_bad(spark):
    # wrong types per column (static schema → every present row fails)
    rules = [Rule(key="integer", validators=[Type("integer")])]
    rows = [{"integer": "not_integer"}]
    assert_parity(spark, rules, rows, "integer string")


def test_union_type_message(spark):
    # union renders '[integer,binary]' (suite test_type_validators_bad)
    rules = [Rule(key="k", validators=[Type(["integer", "binary"])])]
    assert_parity(spark, rules, [{"k": True}], "k boolean")


def test_uniq_list(spark):
    # suite :1376-1501 misc group
    rules = [Rule(key="u", validators=[Type("uniq_list")])]
    rows = [{"u": [1, 4, 7]}, {"u": [1, 4, 7, 5, 5]}]
    assert_parity(spark, rules, rows, "u array<int>")


def test_uniq_proplist(spark):
    # unique by key (first struct field), suite :223,:238
    rules = [Rule(key="u", validators=[Type("uniq_list")])]
    rows = [
        {"u": [("a", "1"), ("b", "1")]},
        {"u": [("a", "1"), ("a", "2")]},
    ]
    assert_parity(spark, rules, rows, "u array<struct<k string, v string>>")


def test_list_of_equal_objects(spark):
    rules = [Rule(key="o", validators=[Type("list_of_equal_objects")])]
    rows = [
        {"o": [{"k1": "1", "k2": "2"}, {"k2": "4", "k1": "4"}]},
        {"o": [{"k1": "1"}, {"other": "4"}]},
        {"o": [{"k1": "1"}]},  # length <= 1 → false (evv.erl:128)
    ]
    assert_parity(spark, rules, rows, "o array<map<string,string>>")


def test_size_string_array_number(spark):
    # suite :334-383 incl. infinity bounds and unicode char counting (:373)
    rules = [
        Rule(key="Key", validators=[Type("binary"), Size(9, 9)]),
        Rule(key="Key1", validators=[Type("list"), Size(2, 2)]),
        Rule(key="Key2", validators=[Type("integer"), Size(-10, 0)]),
        Rule(key="Key3", validators=[Type("float"), Size(-1, 9)]),
        Rule(key="Key4", validators=[Type("float"), Size(None, 9)]),
        Rule(key="Key5", validators=[Type("binary"), Size(1, None)]),
        Rule(key="Key7", validators=[Type("binary"), Size(8, 8)]),
    ]
    rows = [
        {
            "Key": "123456789",
            "Key1": [1, 2],
            "Key2": -10,
            "Key3": -0.4,
            "Key4": -8.888e23,
            "Key5": "eruuhvpegru",
            "Key7": "Кирилицо",  # 8 unicode chars (suite :373)
        }
    ]
    schema = (
        "Key string, Key1 array<int>, Key2 bigint, Key3 double, Key4 double, "
        "Key5 string, Key7 string"
    )
    assert_parity(spark, rules, rows, schema)


def test_size_bad_message(spark):
    # suite :334-352: exact less-than-min message
    rules = [Rule(key="Key", validators=[Type("binary"), Size(10, 100)])]
    assert_parity(spark, rules, [{"Key": "123456789"}], "Key string")


def test_regexp(spark):
    # suite :385-399
    rules = [Rule(key="Ip", validators=[Regexp(r"(\d{1,3}\.){3}\d{1,3}")])]
    rows = [{"Ip": "192.168.1.241"}, {"Ip": "not-an-ip"}]
    assert_parity(spark, rules, rows, "Ip string")


def test_allowed(spark):
    # suite :463-496 (mixed-type allowed list)
    rules = [Rule(key="Ip", validators=[Allowed(["1", "2", 3, 4])])]
    rows = [{"Ip": "2"}, {"Ip": "5"}]
    assert_parity(spark, rules, rows, "Ip string")


def test_validator_conjunction(spark):
    # suite :498-517 — short-circuit order
    rules = [Rule(key="k", validators=[Type("binary"), Size(2, 3), Regexp("^ab")])]
    rows = [{"k": "ab"}, {"k": "a"}, {"k": "xyz"}, {"k": "abcd"}]
    assert_parity(spark, rules, rows, "k string")


def test_or_validator(spark):
    # suite :519-583 — validator-level {'or', ...}: generic message on all-fail
    rules = [Rule(key="k", validators=[OrV([Type("integer"), Size(5, 9)])])]
    rows = [{"k": "12345"}, {"k": "abc"}]
    assert_parity(spark, rules, rows, "k string")


def test_equal_to_object_of_other_keys(spark):
    # suite :585-641 — row-local cross-field key-set equality
    rules = [
        Rule(key="extra", validators=[EqualToObjectOfOtherKeys(["data"])]),
        Rule(key="data"),
    ]
    rows = [
        {"extra": {"a": "1", "b": "2"}, "data": {"b": "9", "a": "0"}},
        {"extra": {"a": "1"}, "data": {"b": "9", "c": "0"}},
    ]
    assert_parity(spark, rules, rows, "extra map<string,string>, data map<string,string>")


def test_custom_validator(spark):
    # suite :401-461: fun/1 with throw protocol
    from evalidate_spark.compiler import EvalidateThrow

    def check(v):
        if v == "123456800":
            return True
        raise EvalidateThrow("What a fuck are you doing!?")

    rules = [Rule(key="Ip", validators=[CustomValidator(check)])]
    rows = [{"Ip": "123456800"}, {"Ip": "1234568"}]

    # oracle uses the Throw class from oracle module — adapt via parity on
    # engine only for the bad row
    from helpers import run_parity

    res, ann, clean = run_parity(spark, rules, rows, "Ip string")
    assert ann[0]["violations"] == []
    assert ann[1]["first_error"]["message"] == "What a fuck are you doing!?"


def test_custom_validator_false_tuple(spark):
    # suite :421-439: {false, msg} protocol wraps into structured payload
    rules = [
        Rule(
            key="Ip",
            validators=[
                CustomValidator(lambda v: True if v == "ok" else (False, "Custom fail"))
            ],
        )
    ]
    from helpers import run_parity

    res, ann, clean = run_parity(spark, rules, [{"Ip": "nope"}], "Ip string")
    assert ann[0]["first_error"]["message"] == "Custom fail"
    assert ann[0]["first_error"]["key_path"] == "Ip"


def test_custom_validator_wrong_fun(spark):
    # non-boolean junk → 'Wrong validation function' (evv.erl:71-72)
    rules = [Rule(key="Ip", validators=[CustomValidator(lambda v: 42)])]
    from helpers import run_parity

    res, ann, clean = run_parity(spark, rules, [{"Ip": "x"}], "Ip string")
    assert ann[0]["first_error"]["message"] == "Wrong validation function"


def test_elementwise_list_type(spark):
    # suite :1869-1939 list_validating group — {list, elem-validators}
    rules = [
        Rule(key="vals", validators=[Type(("list", [Type("binary"), Size(1, 3)]))])
    ]
    rows = [{"vals": ["ab", "c"]}, {"vals": ["ab", "toolong"]}]
    assert_parity(spark, rules, rows, "vals array<string>")
