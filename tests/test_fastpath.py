"""Predicate-only fast path: fail predicate ≡ (size(violations) > 0) of the
rich engine on the violation-injected fixture; scan pruning verified from
the executed plan."""

import re

import pytest

from pyspark.sql import functions as _F
from pyspark.sql import functions as F

from evalidate_spark import Rule, RuleAnd, RuleOr, Allowed, Size, Type, validate
from evalidate_spark.fastpath import compile_fail_predicate, verdict_scan
from evalidate_spark.fixtures import gen_documents
from evalidate_spark.operators.spans import span_rules


def assert_equiv(df, rules, id_col="doc_id"):
    rich = validate(df, rules, id_cols=[id_col]).annotated.select(
        F.monotonically_increasing_id().alias("i"),
        (F.size("violations") > 0).alias("rich_fail"),
    )
    fast = df.select(
        F.monotonically_increasing_id().alias("i"),
        F.coalesce(compile_fail_predicate(rules, df.schema), F.lit(False)).alias("fast_fail"),
    )
    j = rich.join(fast, "i")
    assert j.filter(F.col("rich_fail") != F.col("fast_fail")).count() == 0
    assert rich.filter("rich_fail").count() > 0  # fixture must exercise failures


def assert_equiv_no_require_fail(df, rules):
    rich = validate(df, rules, gate_fast=False).annotated.select(
        _F.monotonically_increasing_id().alias("i"),
        (_F.size("violations") > 0).alias("rich_fail"),
    )
    fast = df.select(
        _F.monotonically_increasing_id().alias("i"),
        _F.coalesce(compile_fail_predicate(rules, df.schema), _F.lit(False)).alias("fast_fail"),
    )
    j = rich.join(fast, "i")
    mism = j.filter(_F.col("rich_fail") != _F.col("fast_fail")).count()
    assert mism == 0
    assert rich.filter("rich_fail").count() > 0


class TestFastPath:
    def test_span_rules_equiv_on_fixture(self, spark):
        docs = gen_documents(spark, 3000, partitions=4)
        assert_equiv(docs, span_rules())

    def test_flat_rules_equiv(self, spark):
        df = spark.createDataFrame(
            [("d1", "hello", "en"), (None, "x", "en"), ("d3", None, "zz"), ("d4", "okay!", "es")],
            "doc_id string, text string, lang string",
        )
        rules = [
            Rule(key="doc_id"),
            Rule(key="text", validators=[Type("binary"), Size(3, 10)]),
            Rule(key="lang", validators=[Allowed(["en", "es"])]),
            Rule(key="absent"),
            RuleOr(rules=[Rule(key="lang", validators=[Allowed(["en"])]),
                          Rule(key="text", validators=[Size(1, 5)])]),
            RuleAnd(rules=[Rule(key="doc_id", validators=[Size(1, 99)])]),
        ]
        rich = validate(df, rules, id_cols=["doc_id"]).annotated.select(
            "text", (F.size("violations") > 0).alias("rf")
        ).collect()
        fast = df.select(
            "text", F.coalesce(compile_fail_predicate(rules, df.schema), F.lit(False)).alias("ff")
        ).collect()
        assert {(r["text"], r["rf"]) for r in rich} == {(r["text"], r["ff"]) for r in fast}

    def test_verdict_scan_equals_rich_verdicts(self, spark):
        docs = gen_documents(spark, 2000, partitions=4)
        rich = validate(docs, span_rules(), id_cols=["doc_id"]).verdicts
        fast = verdict_scan(docs, span_rules())
        key = lambda rows: {r["partition_id"]: (r["rows"], r["passed"], r["failed"], r["verdict"]) for r in rows}
        assert key(fast.collect()) == key(rich.collect())

    def test_scan_is_pruned(self, spark, tmp_path):
        path = str(tmp_path / "docs")
        gen_documents(spark, 500, partitions=2).write.parquet(path)
        docs = spark.read.parquet(path)
        plan = verdict_scan(docs, span_rules())._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"ReadSchema: (\S+)", plan)
        assert m, plan
        schema = m.group(1)
        assert "text" not in schema and "media_ref" not in schema
        assert "kind" in schema and "offset" in schema

    def test_annotated_plan_is_shuffle_free(self, spark, tmp_path):
        # the rich validation pass is ONE fused projection: scan → project,
        # zero exchanges — the property that makes it scale linearly
        path = str(tmp_path / "docs_plan")
        gen_documents(spark, 300, partitions=2).write.parquet(path)
        docs = spark.read.parquet(path)
        ann = validate(docs, span_rules(), id_cols=["doc_id"]).annotated
        plan = ann._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_verdict_scan_single_exchange(self, spark, tmp_path):
        # verdict roll-up: scan → fused boolean → partial agg → ONE
        # exchange of ≤ #partitions rows → final agg
        path = str(tmp_path / "docs_plan2")
        gen_documents(spark, 300, partitions=2).write.parquet(path)
        docs = spark.read.parquet(path)
        plan = (
            verdict_scan(docs, span_rules())
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan

    def test_converter_failures_in_predicate(self, spark):
        # rows failing ONLY through conversion must still fail the predicate
        df = spark.createDataFrame(
            [("d1", "12"), ("d2", "oops"), ("d3", None)], "doc_id string, n_str string"
        )
        rules = [Rule(key="doc_id"), Rule(key="n_str", presence="optional", converter="to_int")]
        assert_equiv_no_require_fail(df, rules)

    def test_custom_validator_rejected(self, spark):
        from evalidate_spark.spec import CustomValidator, SpecError

        df = spark.createDataFrame([("a",)], "k string")
        rules = [Rule(key="k", validators=[CustomValidator(lambda v: True)])]
        with pytest.raises(SpecError, match="predicate-only"):
            compile_fail_predicate(rules, df.schema)

    def test_doubly_nested_array_childs(self, spark):
        # array<struct> nested inside array<struct> childs: the predicate
        # path must resolve inner fields via element lambdas, not root
        # F.col dotted paths (which fail analysis)
        df = spark.createDataFrame(
            [
                ("d1", [{"name": "a", "inner": [{"kind": "text", "v": 1}]}]),
                ("d2", [{"name": "b", "inner": [{"kind": "bogus", "v": 2}]}]),
                ("d3", [{"name": None, "inner": [{"kind": "media", "v": None}]}]),
                ("d4", [{"name": "c", "inner": []}]),
            ],
            "doc_id string, docs array<struct<name:string, inner:array<struct<kind:string, v:int>>>>",
        )
        rules = [
            Rule(key="doc_id"),
            Rule(
                key="docs",
                childs=[
                    Rule(key="name"),
                    Rule(
                        key="inner",
                        childs=[
                            Rule(key="kind", validators=[Allowed(["text", "media"])]),
                            Rule(key="v", presence="optional", validators=[Size(0, 10)]),
                        ],
                    ),
                ],
            ),
        ]
        assert_equiv_no_require_fail(df, rules)
        # and the default gated validate() must agree with the ungated one
        gated = validate(df, rules).annotated.select(
            "doc_id", F.size("violations").alias("n")
        ).collect()
        rich = validate(df, rules, gate_fast=False).annotated.select(
            "doc_id", F.size("violations").alias("n")
        ).collect()
        assert {(r["doc_id"], r["n"]) for r in gated} == {(r["doc_id"], r["n"]) for r in rich}

    def test_childs_with_converter_fail_gated(self, spark):
        # converter over struct-childs output: the rich path emits a
        # "Couldn't convert" violation (filter_duplicates on a struct);
        # the gate predicate must not drop it
        df = spark.createDataFrame(
            [("d1", {"k": "x"})], "doc_id string, obj struct<k:string>"
        )
        rules = [
            Rule(key="doc_id"),
            Rule(key="obj", childs=[Rule(key="k")], converter="filter_duplicates"),
        ]
        rich_n = (
            validate(df, rules, gate_fast=False)
            .annotated.select(F.size("violations").alias("n"))
            .collect()[0]["n"]
        )
        gated_n = (
            validate(df, rules)
            .annotated.select(F.size("violations").alias("n"))
            .collect()[0]["n"]
        )
        assert rich_n == 1
        assert gated_n == rich_n

    def test_deprecated_and_default(self, spark):
        df = spark.createDataFrame(
            [("a", "x"), ("b", None)], "doc_id string, legacy string"
        )
        rules = [Rule(key="doc_id"), Rule(key="legacy", presence="deprecated")]
        fast = df.select(
            "doc_id", compile_fail_predicate(rules, df.schema).alias("f")
        ).collect()
        assert {r["doc_id"]: r["f"] for r in fast} == {"a": True, "b": False}
