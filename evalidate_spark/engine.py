"""Validation engine: the public API.

``validate(df, rules, ...)`` compiles the spec against ``df.schema`` and
returns a :class:`ValidationResult` exposing lazy DataFrames:

* ``annotated`` — input + ``violations`` array + ``first_error`` struct
* ``clean``     — rows with zero violations, projected to the converted
  output schema (only ruled keys survive, mirroring the reference —
  ``/root/reference/test/evalidate_SUITE.erl:1703-1716``)
* ``violations`` — one row per violation: id columns + ``rule_seq, rule_id,
  key_path, span_index, message, value_repr`` (the typed violation rows of
  the north rule)
* ``verdicts``  — per-partition pass/fail roll-up via ``spark_partition_id()``

Hard vs soft mode (``/root/reference/src/evalidate.erl:22-34``): soft mode
never raises; ``enforce()`` reproduces hard mode — it runs an action and
raises :class:`ValidationError` with the first error if any row violated.

Scale notes: everything row-level is one fused projection (no shuffle).  The
verdict roll-up is a tiny aggregate keyed by partition id (≤ #partitions
groups, map-side combined).  At 10^12 docs the plan is scan → project →
partial agg → final agg; AQE handles output coalescing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compiler import Compiled, Options, compile_spec

VIOLATIONS_COL = "violations"
FIRST_ERROR_COL = "first_error"


class ValidationError(Exception):
    """Hard-mode failure; carries the first violation's message (the exact
    string the reference would have thrown)."""

    def __init__(self, message: str, row: Optional[dict] = None) -> None:
        super().__init__(message)
        self.message = message
        self.row = row


@dataclass
class ValidationResult:
    annotated: DataFrame
    compiled: Compiled
    id_cols: List[str]

    @property
    def clean(self) -> DataFrame:
        """Rows with no violations, projected to converted output columns
        (the compiled expressions — conversions applied, defaults injected,
        ``no_return`` keys dropped)."""
        ok = self.annotated.filter(F.size(F.col(VIOLATIONS_COL)) == 0)
        outs = self.compiled.outputs
        if not outs:
            return ok.drop(VIOLATIONS_COL, FIRST_ERROR_COL)
        names = {o.name for o in outs}
        keep = [F.col(n) for n in self.id_cols if n not in names]
        return ok.select(*keep, *[o.col.alias(o.name) for o in outs])

    @property
    def failed(self) -> DataFrame:
        return self.annotated.filter(F.size(F.col(VIOLATIONS_COL)) > 0)

    @property
    def violations(self) -> DataFrame:
        """Exploded typed violation rows (sparse; explode only over failing
        rows' arrays)."""
        v = self.annotated.select(
            *self.id_cols, F.explode(F.col(VIOLATIONS_COL)).alias("v")
        )
        return v.select(
            *self.id_cols,
            F.col("v.rule_seq").alias("rule_seq"),
            F.col("v.rule_id").alias("rule_id"),
            F.col("v.key_path").alias("key_path"),
            F.col("v.span_index").alias("span_index"),
            F.col("v.message").alias("message"),
            F.col("v.value_repr").alias("value_repr"),
        )

    @property
    def verdicts(self) -> DataFrame:
        """Per-partition pass/fail verdict rows (north rule).  Keyed by
        ``spark_partition_id()`` — at most one group per input partition, so
        the shuffle is negligible at any scale."""
        return (
            self.annotated.select(
                F.spark_partition_id().alias("partition_id"),
                (F.size(F.col(VIOLATIONS_COL)) == 0).cast("int").alias("ok"),
            )
            .groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("ok").alias("passed"),
                (F.count(F.lit(1)) - F.sum("ok")).alias("failed"),
            )
            .withColumn("verdict", F.when(F.col("failed") == 0, F.lit("pass")).otherwise(F.lit("fail")))
        )

    def metrics(self) -> DataFrame:
        """Per-rule violation counts — one small aggregate."""
        return (
            self.violations.groupBy("rule_id", "key_path")
            .agg(F.count(F.lit(1)).alias("violations"))
            .orderBy("rule_id", "key_path")
        )

    def enforce(self) -> DataFrame:
        """Hard mode (`/root/reference/src/evalidate.erl:32-33`): raise
        :class:`ValidationError` with the depth-first first error if any row
        fails; otherwise return the clean output."""
        bad = (
            self.annotated.filter(F.size(F.col(VIOLATIONS_COL)) > 0)
            .select(F.col(FIRST_ERROR_COL).alias("e"), *[F.col(c) for c in self.id_cols])
            .limit(1)
            .collect()
        )
        if bad:
            row = bad[0]
            raise ValidationError(row["e"]["message"], row.asDict())
        return self.clean


def validate(
    df: DataFrame,
    rules: Any,
    *,
    mode: str = "soft",
    parent_key: bool = True,
    keep_unruled: bool = False,
    id_cols: Optional[Sequence[str]] = None,
    gate_fast: bool = True,
) -> ValidationResult:
    """Compile *rules* against ``df.schema`` and annotate every row with its
    violations.  Spec errors raise :class:`evalidate_spark.spec.SpecError`
    before any job launches (reference config errors,
    ``/root/reference/src/evv.erl:86-87,124-125``).

    ``gate_fast`` (default on) guards the full violation-construction
    expression behind the cheap predicate-only compile
    (:mod:`evalidate_spark.fastpath`): rows with zero violations — the
    overwhelming majority at corpus scale — evaluate only the boolean and
    skip message/struct building entirely.  The two compilations are
    equivalence-tested, so results are identical; gating is skipped
    automatically for specs with custom pandas-UDF validators (the UDF
    must not run twice)."""
    opts = Options(mode=mode, parent_key=parent_key, keep_unruled=keep_unruled)
    compiled = compile_spec(rules, df.schema, opts)
    ids = list(id_cols) if id_cols else [df.schema.fields[0].name]
    viols = compiled.violations
    if gate_fast:
        from .fastpath import _has_custom, compile_fail_predicate
        from .spec import normalize_rules

        from .compiler import _empty_viols

        nodes = normalize_rules(rules)
        if not any(_has_custom(n) for n in nodes):
            fail = compile_fail_predicate(rules, df.schema, opts)
            viols = F.when(F.coalesce(fail, F.lit(False)), viols).otherwise(
                _empty_viols()
            )
    annotated = df.withColumn(VIOLATIONS_COL, viols).withColumn(
        FIRST_ERROR_COL, F.try_element_at(F.col(VIOLATIONS_COL), F.lit(1))
    )
    return ValidationResult(annotated=annotated, compiled=compiled, id_cols=ids)


def validate_zipped(
    df: DataFrame,
    rulesets: Sequence[Any],
    ruleset_id_col: str = "ruleset_id",
    *,
    mode: str = "soft",
    parent_key: bool = True,
    id_cols: Optional[Sequence[str]] = None,
    gate_fast: bool = True,
) -> ValidationResult:
    """Zipped rule-sets mode (reference ``struct/3`` zipwith branch,
    ``/root/reference/src/evalidate.erl:44-46``; suite ``:1145-1180``):
    rule-set *i* validates the rows whose ``ruleset_id_col`` equals *i*.

    The reference zips N rule-sets against N rows positionally; the
    Spark-native shape is a ``ruleset_id`` column dispatching each row to
    its rule-set.  Every rule-set compiles once on the driver; the dispatch
    is a single ``when/otherwise`` chain inside the same fused projection —
    no shuffle, no per-ruleset pass over the data.  Rows with an id outside
    ``0..len(rulesets)-1`` get a config-error violation (the reference
    would crash on a length mismatch).

    Output columns are the union of all rule-sets' outputs; a row populates
    only its own rule-set's keys (others NULL), with conflicting Spark
    types across rule-sets rejected at compile time."""
    from pyspark.sql import types as TT

    from .compiler import OutCol, _empty_viols, _entry_array, _viol_struct
    from .spec import SpecError

    opts = Options(mode=mode, parent_key=parent_key)
    compiled = [compile_spec(rs, df.schema, opts) for rs in rulesets]
    rid = F.col("`%s`" % ruleset_id_col)
    # per-ruleset fast gating (same trick as validate()): passing rows —
    # the vast majority — evaluate only the boolean predicate of their own
    # rule-set and skip message/struct construction
    viol_cols = [c.violations for c in compiled]
    if gate_fast:
        from .fastpath import _has_custom, compile_fail_predicate
        from .spec import normalize_rules as _norm

        for i, rs in enumerate(rulesets):
            if any(_has_custom(n) for n in _norm(rs)):
                continue
            fail = compile_fail_predicate(rs, df.schema, opts)
            viol_cols[i] = F.when(
                F.coalesce(fail, F.lit(False)), viol_cols[i]
            ).otherwise(_empty_viols())
    bad_id = _entry_array(
        F.when(
            rid.isNull() | (rid < 0) | (rid >= len(rulesets)),
            _viol_struct(
                0,
                "ruleset_dispatch",
                F.lit(ruleset_id_col),
                F.concat(
                    F.lit("No rule-set for %s=" % ruleset_id_col),
                    F.coalesce(rid.cast("string"), F.lit("NULL")),
                ),
                None,
            ),
        )
    )
    chain = None
    for i, vc in enumerate(viol_cols):
        chain = F.when(rid == i, vc) if chain is None else chain.when(rid == i, vc)
    viols = chain.otherwise(bad_id) if chain is not None else bad_id

    # union of outputs, each guarded by its rule-set winning the dispatch
    names: List[str] = []
    for c in compiled:
        for o in c.outputs:
            if o.name not in names:
                names.append(o.name)
    merged: List[OutCol] = []
    for name in names:
        dts = {
            o.dtype.simpleString()
            for c in compiled
            for o in c.outputs
            if o.name == name and not isinstance(o.dtype, TT.NullType)
        }
        if len(dts) > 1:
            raise SpecError(
                "conflicting output types for key '%s' across rule-sets: %s"
                % (name, sorted(dts))
            )
        expr = F.lit(None)
        present = F.lit(False)
        dtype: Any = TT.NullType()
        for i, c in enumerate(compiled):
            match = [o for o in c.outputs if o.name == name]
            if not match:
                continue
            o = match[0]
            dtype = o.dtype if not isinstance(o.dtype, TT.NullType) else dtype
            emitted = (rid == i) if o.present is None else ((rid == i) & o.present)
            expr = F.when(emitted, o.col).otherwise(expr)
            present = present | emitted
        merged.append(OutCol(name, expr, dtype, present))

    annotated = df.withColumn(VIOLATIONS_COL, viols).withColumn(
        FIRST_ERROR_COL, F.try_element_at(F.col(VIOLATIONS_COL), F.lit(1))
    )
    comp = Compiled(violations=viols, outputs=merged, opts=opts)
    ids = list(id_cols) if id_cols else [df.schema.fields[0].name]
    return ValidationResult(annotated=annotated, compiled=comp, id_cols=ids)


def validate_and_convert(df: DataFrame, rules: Any, **kw: Any) -> DataFrame:
    """Reference-shaped entry (`validate_and_convert/2,3`,
    ``/root/reference/src/evalidate.erl:19-34``): hard mode — raises on the
    first violation, returns the converted clean DataFrame otherwise."""
    return validate(df, rules, **kw).enforce()


def golden_check(
    df: DataFrame,
    rules: Any,
    expect_col: str = "expect_pass",
    id_cols: Optional[Sequence[str]] = None,
    **opts: Any,
) -> DataFrame:
    """Deploy-time golden-row self-test: run *rules* over a small pinned
    corpus whose boolean *expect_col* says whether each row MUST pass,
    and return the mismatches — empty result = the engine + spec still
    behave exactly as pinned.  The operational guard a validation
    pipeline runs before processing real data after ANY change (spec
    edit, engine upgrade, Spark version bump): golden rows encode the
    contract's accepted and rejected examples, so a silently-loosened
    rule or a regressed validator surfaces as a one-row diff instead of
    a corrupted corpus.

    Output per mismatching golden row: ``(id_cols…, expect_pass,
    got_pass, n_violations, first_message)``.  A NULL *expect_col* is
    itself a mismatch (an unlabelled golden row is a broken fixture).
    *expect_col* is excluded from validation (it is harness metadata,
    not data); all other ``validate`` options pass through."""
    if expect_col not in df.columns:
        raise ValueError("golden_check: missing expect column '%s'" % expect_col)
    ec = F.col("`%s`" % expect_col)
    # validate the WHOLE df (annotated preserves input rows 1:1, so the
    # expectation reads straight from its own column — no id-join, no
    # uniqueness requirement on golden ids); expect_col has no rule, so
    # it is never validated itself
    res2 = validate(df, rules, id_cols=id_cols, **opts)
    ann = res2.annotated
    got = F.size(F.col(VIOLATIONS_COL)) == 0
    # F.get, not element_at: NULL (never an ANSI error) on the empty
    # violations array of an unexpectedly-passing row
    first = F.get(F.col(VIOLATIONS_COL), 0)
    return (
        ann.filter(ec.isNull() | (ec != got))
        .select(
            *(res2.id_cols or []),
            ec.alias("expect_pass"),
            got.alias("got_pass"),
            F.size(F.col(VIOLATIONS_COL)).cast("int").alias("n_violations"),
            first["message"].alias("first_message"),
        )
    )
