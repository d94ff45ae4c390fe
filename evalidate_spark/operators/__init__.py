"""Table-level validation operators (north-rule additions beyond the
reference's element-local checks — SURVEY.md §2.8).

* :mod:`.table_checks` — column stats profile, uniqueness, referential
  integrity, distribution drift (numeric PSI/KS + categorical PSI/TVD)
* :mod:`.spans` — span-sequence structural validation on the interleaved
  text+media documents table (explode-free HOFs)
* :mod:`.sessions` — gap-based event sessionization (windowed)
* :mod:`.asof` — point-in-time (as-of) feature join, union+window form
* :mod:`.suggest` — constraint suggestion: profile the data, emit the
  rule spec it satisfies (feeds straight back into ``validate``)
"""

from .table_checks import (
    profile,
    profile_state,
    merge_profile_states,
    uniqueness_violations,
    referential_violations,
    drift,
    drift_categorical,
    drift_quantile,
    referential_violations_bloom,
)
from .spans import span_rules, span_structure_violations
from .sessions import session_bounds, sessionize
from .asof import asof_join
from .suggest import suggest_constraints, suggestions_to_spec
