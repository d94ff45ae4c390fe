"""Table-level validation operators (north-rule additions beyond the
reference's element-local checks — SURVEY.md §2.8).

* :mod:`.table_checks` — column stats profile (+ mergeable HLL/KLL
  states with anomaly alerting and state-to-state KS drift), uniqueness,
  referential integrity (anti-join + Bloom-gated), distribution drift
  (numeric PSI/KS + categorical PSI/TVD), heavy-hitter skew report,
  Theta-sketch corpus overlap, check-suite roll-up
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
    profile_anomalies,
    quantile_state,
    merge_quantile_states,
    quantile_drift_states,
    uniqueness_violations,
    referential_violations,
    drift,
    drift_categorical,
    drift_quantile,
    referential_violations_bloom,
    skew_report,
    column_entropy,
    check_expressions,
    expression_violations,
    null_correlation,
    mutual_information,
    benford,
    group_drift,
    hotkey_state,
    merge_hotkey_states,
    cardinality_check,
    uniqueness_state,
    merge_uniqueness_states,
    overlap_estimate,
    check_suite,
    iqr_outliers,
    mad_outliers,
    winsorize,
    column_fingerprints,
    merge_column_fingerprints,
    inclusion_deps,
    correlation_matrix,
    freshness,
    violation_examples,
    embedding_health,
    rate_anomalies,
    rate_from_counts,
    group_completeness,
    value_shapes,
    k_anonymity,
    bloom_build,
    concentration_profile,
    l_diversity,
    seasonal_anomalies,
    join_fanout,
    equifreq_profile,
)
from .spans import (
    caption_proximity_violations,
    span_grammar,
    span_rules,
    span_structure_violations,
)
from .reconcile import (
    changelog_compact,
    reconcile_sums,
    survivorship,
    table_diff,
)
from .behavior import cohort_retention, funnel_steps, rolling_active_users, transition_matrix
from .sessions import (
    gap_stats,
    resample_locf,
    sequence_anomalies,
    session_bounds,
    sessionize,
    suppress_repeats,
    trailing_window_features,
)
from .asof import asof_join, interval_islands, interval_overlap_join, range_join
from .olap import pivot_matrix, rollup_report
from .suggest import (
    functional_dependencies,
    rule_cooccurrence,
    suggest_constraints,
    suggestions_to_spec,
)
