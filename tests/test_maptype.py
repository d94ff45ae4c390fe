"""Dynamic-key data: rules and childs over MapType columns — the Spark twin
of the reference's fully-dynamic proplists
(``/root/reference/src/evalidate.erl:114``; presence group suite
``test/evalidate_SUITE.erl:738-815``)."""

import pytest

from pyspark.sql import functions as F

from evalidate_spark import Allowed, Default, Rule, Size, Type, validate
from evalidate_spark.fastpath import compile_fail_predicate
from tests.helpers import assert_parity

SCHEMA = "attrs map<string,string>"


class TestMapChilds:
    def test_presence_group_parity(self, spark):
        # required / optional / {optional, Default} / deprecated over
        # dynamic keys (suite :738-815)
        rules = [
            Rule(
                key="attrs",
                childs=[
                    Rule(key="k1", presence="required"),
                    Rule(key="k2", presence="optional"),
                    Rule(key="k3", presence=Default("dflt")),
                    Rule(key="k4", presence="deprecated"),
                ],
            )
        ]
        rows = [
            {"attrs": {"k1": "a", "k2": "b", "k3": "c"}},
            {"attrs": {"k1": "a"}},                      # k3 defaulted
            {"attrs": {"k2": "b"}},                      # k1 missing → required
            {"attrs": {"k1": "a", "k4": "legacy"}},      # k4 present → deprecated
            {"attrs": {}},
            {"attrs": None},                             # whole map missing
        ]
        assert_parity(spark, rules, rows, SCHEMA)

    def test_value_rules_and_converters_parity(self, spark):
        rules = [
            Rule(
                key="attrs",
                childs=[
                    Rule(key="lang", validators=[Allowed(["en", "es"])]),
                    Rule(key="name", validators=[Type("binary"), Size(1, 5)],
                         converter="lowercase"),
                ],
            )
        ]
        rows = [
            {"attrs": {"lang": "en", "name": "ABC"}},
            {"attrs": {"lang": "zz", "name": "ok"}},        # allowed fails
            {"attrs": {"lang": "es", "name": "toolongname"}},  # size fails
            {"attrs": {"lang": "en"}},                       # name required
        ]
        assert_parity(spark, rules, rows, SCHEMA)

    def test_dotted_key_path(self, spark):
        df = spark.createDataFrame([({"x": "1"},)], SCHEMA)
        rules = [Rule(key="attrs", childs=[Rule(key="missing")])]
        [v] = validate(df, rules, id_cols=["attrs"]).violations.collect()
        assert v["message"] == "Key 'attrs.missing' is required"
        assert v["key_path"] == "attrs.missing"

    def test_array_of_maps_childs(self, spark):
        # list of dynamic objects under a key (suite :1231-1279 shape with
        # proplist elements)
        df = spark.createDataFrame(
            [
                ("d1", [{"kind": "text"}, {"kind": "media"}]),
                ("d2", [{"kind": "bogus"}]),
                ("d3", [{"other": "x"}]),  # kind missing in element
            ],
            "doc_id string, objs array<map<string,string>>",
        )
        rules = [
            Rule(key="doc_id"),
            Rule(
                key="objs",
                childs=[Rule(key="kind", validators=[Allowed(["text", "media"])])],
            ),
        ]
        got = {
            r["doc_id"]: (r["span_index"], r["message"])
            for r in validate(df, rules, id_cols=["doc_id"]).violations.collect()
        }
        assert set(got) == {"d2", "d3"}
        assert got["d2"][0] == 0 and "allowed list" in got["d2"][1]
        assert got["d3"][1] == "Key 'objs.kind' is required"

    def test_fastpath_equivalence_on_maps(self, spark):
        df = spark.createDataFrame(
            [
                ({"k1": "a", "lang": "en"},),
                ({"lang": "zz"},),
                ({"k1": "a"},),
                (None,),
            ],
            SCHEMA,
        )
        rules = [
            Rule(
                key="attrs",
                presence="optional",
                childs=[
                    Rule(key="k1"),
                    Rule(key="lang", presence="optional",
                         validators=[Allowed(["en", "es"])]),
                ],
            )
        ]
        rich = validate(df, rules, gate_fast=False).annotated.select(
            (F.size("violations") > 0).alias("rf")
        ).collect()
        fast = df.select(
            F.coalesce(compile_fail_predicate(rules, df.schema), F.lit(False)).alias("ff")
        ).collect()
        assert [r["rf"] for r in rich] == [r["ff"] for r in fast]
        assert any(r["rf"] for r in rich) and not all(r["rf"] for r in rich)

    def test_uniq_and_equal_objects_on_maps(self, spark):
        # type-system ops that already understood maps keep working with
        # dynamic childs present in the same spec
        df = spark.createDataFrame(
            [("a", {"x": "1", "y": "2"}), ("b", {"x": "1"})],
            "doc_id string, attrs map<string,string>",
        )
        rules = [
            Rule(key="doc_id"),
            Rule(key="attrs", validators=[Type("list"), Size(1, 10)],
                 childs=[Rule(key="x")]),
        ]
        res = validate(df, rules, id_cols=["doc_id"])
        assert res.violations.count() == 0
        clean = {r["doc_id"]: r["attrs"] for r in res.clean.collect()}
        assert clean["a"]["x"] == "1"


def test_uniq_list_statically_true_on_maps(spark):
    from evalidate_spark import Type as TypeV

    df = spark.createDataFrame([({"a": "1", "b": "2"},)], "attrs map<string,string>")
    rules = [Rule(key="attrs", validators=[TypeV("uniq_list")])]
    assert validate(df, rules, id_cols=["attrs"]).violations.count() == 0
