"""Library validators (suite evalidate_lib group :1503-1663) and spec/config
errors (suite errors group :161-210)."""

import pytest

from evalidate_spark import lib
from evalidate_spark.spec import Rule, SpecError, Type
from helpers import assert_parity, run_parity


def test_binary_integer(spark):
    rules = [Rule(key="k", validators=[lib.v_binary_integer()])]
    assert_parity(spark, rules, [{"k": "11"}, {"k": "XVII"}, {"k": "1.5"}], "k string")


def test_binary_integer_bounds(spark):
    # bound failure uses the size_validator 'limit' messages
    rules = [Rule(key="k", validators=[lib.v_binary_integer(10, 20)])]
    res, ann, clean = run_parity(spark, rules, [{"k": "5"}, {"k": "15"}, {"k": "25"}], "k string")
    assert ann[0]["first_error"]["message"] == (
        "Value is not valid. Value's limit is less than minimum allowed: 10"
    )
    assert ann[1]["violations"] == []
    assert ann[2]["first_error"]["message"] == (
        "Value is not valid. Value's limit is more than maximum allowed: 20"
    )
    assert_parity(spark, rules, [{"k": "5"}, {"k": "15"}, {"k": "25"}], "k string")


def test_binary_numeric(spark):
    rules = [Rule(key="k", validators=[lib.v_binary_numeric()])]
    assert_parity(spark, rules, [{"k": "11"}, {"k": "11.03"}, {"k": "XVII"}], "k string")


def test_binary_boolean(spark):
    rules = [Rule(key="k", validators=[lib.v_binary_boolean()])]
    assert_parity(
        spark, rules, [{"k": "true"}, {"k": "false"}, {"k": "TRUE"}, {"k": "1"}], "k string"
    )


def test_email(spark):
    rules = [Rule(key="k", validators=[lib.v_email()])]
    assert_parity(
        spark,
        rules,
        [{"k": "a.b@example.com"}, {"k": "not-an-email"}, {"k": "x@y.io"}],
        "k string",
    )


def test_url(spark):
    rules = [Rule(key="k", validators=[lib.v_url()])]
    assert_parity(
        spark,
        rules,
        [{"k": "http://example.com/a?b=1"}, {"k": "htp:/bad"}, {"k": "https://x.io"}],
        "k string",
    )


def test_uuid(spark):
    rules = [Rule(key="k", validators=[lib.v_uuid_v4()])]
    assert_parity(
        spark,
        rules,
        [
            {"k": "F47AC10B-58CC-4372-A567-0E02B2C3D479"},
            {"k": "f47ac10b-58cc-4372-a567-0e02b2c3d479"},
            {"k": "f47ac10b-58cc-1372-a567-0e02b2c3d479"},  # v1, not v4
        ],
        "k string",
    )


def test_password(spark):
    # exact thrown messages (suite :1631-1663, evv.erl:197-205)
    rules = [Rule(key="k", validators=[lib.v_password()])]
    rows = [
        {"k": "Aa1!aaaaa"},
        {"k": "short"},
        {"k": "nouppercase1!"},
    ]
    res, ann, clean = run_parity(spark, rules, rows, "k string")
    assert ann[0]["violations"] == []
    assert ann[1]["first_error"]["message"] == "Password length must be at least 9 characters"
    assert ann[2]["first_error"]["message"] == (
        "Password must contain at least one uppercase, one lowercase, "
        "one special symbol and one numeric symbol"
    )
    assert_parity(spark, rules, rows, "k string")


def test_elements_in(spark):
    rules = [Rule(key="k", validators=[lib.elements_in(["a", "b"])])]
    assert_parity(spark, rules, [{"k": ["a", "b", "a"]}, {"k": ["a", "z"]}], "k array<string>")


def test_unicode_null(spark):
    rules = [Rule(key="k", validators=[lib.v_unicode_null()])]
    res, ann, clean = run_parity(spark, rules, [{"k": "ok"}, {"k": "bad\x00byte"}], "k string")
    assert ann[0]["violations"] == []
    assert ann[1]["first_error"]["message"] == "Unsupported unicode control code"


def test_utf8(spark):
    rules = [Rule(key="k", validators=[lib.v_utf8()])]
    assert_parity(spark, rules, [{"k": "Кирилицо"}], "k string")


# ---- spec/config errors (suite errors group :161-210) ----------------------
def test_unknown_type_validator_is_spec_error(spark):
    with pytest.raises(SpecError):
        Type("unknown_type")


def test_unknown_validator_is_spec_error(spark):
    with pytest.raises(SpecError):
        Rule(key="k", validators=["not-a-validator"])


def test_unknown_rule_is_spec_error(spark):
    from evalidate_spark import validate

    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(SpecError):
        validate(df, ["not-a-rule"])


def test_wrong_converter_is_spec_error(spark):
    with pytest.raises(SpecError):
        Rule(key="k", converter="bogus_converter")


def test_validate_password_standalone():
    # validate_password/1 (evalidate.erl:36-37): True or raises the exact
    # thrown message (suite :1652, :1656)
    from evalidate_spark import ValidationError

    assert lib.validate_password("GoodPassw0rd!") is True
    with pytest.raises(ValidationError, match="at least 9 characters"):
        lib.validate_password("Short1!")
    with pytest.raises(ValidationError, match="shorter than 256 characters"):
        lib.validate_password("A1!" + "a" * 260)
    with pytest.raises(ValidationError, match="one uppercase, one lowercase"):
        lib.validate_password("nouppercase1!")
    with pytest.raises(ValidationError):
        lib.validate_password(12345)
