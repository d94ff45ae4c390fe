"""evalidate_spark — a from-scratch PySpark-native validation & conversion
engine with the capabilities of sergebond/evalidate (reference read-only at
/root/reference), re-expressed Spark-first per SURVEY.md.

Public surface:

* :mod:`evalidate_spark.spec`     — declarative rule DSL (dataclasses)
* :mod:`evalidate_spark.engine`   — ``validate`` / ``validate_and_convert``
* :mod:`evalidate_spark.lib`      — library validators (?V_EMAIL, ?V_UUID, …)
* :mod:`evalidate_spark.oracle`   — pure-Python reference oracle for tests
* :mod:`evalidate_spark.operators` — table-level checks (stats, uniqueness,
  referential, drift, span structure)
* :mod:`evalidate_spark.functions` — training-data ops (dedup, similarity,
  text analysis, multimodal plumbing)
"""

from .engine import (
    ValidationError,
    ValidationResult,
    golden_check,
    validate,
    validate_and_convert,
    validate_zipped,
)
from .fastpath import compile_fail_predicate, verdict_scan
from .values import validate_value, validate_values
from .spec import (
    Allowed,
    CustomConverter,
    CustomValidator,
    Default,
    Each,
    EqualToObjectOfOtherKeys,
    OrV,
    Regexp,
    Rule,
    RuleAnd,
    RuleOr,
    Size,
    SpecError,
    Type,
    DEPRECATED,
    OPTIONAL,
    REQUIRED,
)

__version__ = "0.1.0"
