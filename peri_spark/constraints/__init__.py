"""Table-level constraint stages (north-rule additions; SURVEY.md §2.6).

No Peri analogue — the reference validates one record at a time. These
stages reuse Peri's violation row shape (path/key/message/content) so
row-level and table-level violations union into one frame.
"""

from .stats import (column_quantiles, column_stats, stats_violations,
                    top_values, value_distribution_stats)
from .uniqueness import uniqueness_violations
from .referential import referential_violations
from .drift import chi_square_drift, ks_drift, psi_drift, histogram
from .verdicts import compare_verdicts, partition_verdicts
from .fidelity import fidelity_violations
from .reconcile import diff_rows, table_diff
from .anomaly import metric_anomalies
from .sampling import sample_validate
from .completeness import partition_completeness
from .sketches import (distinct_sketches, merge_distinct_sketches,
                       merge_quantile_sketches, novelty_estimate,
                       quantile_sketches, theta_sketches)
from .numstats import (benford_drift, corr_matrix, fd_violations,
                       robust_outliers)

__all__ = [
    "column_stats", "column_quantiles", "top_values",
    "value_distribution_stats",
    "stats_violations", "uniqueness_violations",
    "referential_violations", "chi_square_drift", "ks_drift", "psi_drift", "histogram",
    "partition_verdicts", "compare_verdicts", "fidelity_violations",
    "robust_outliers", "benford_drift", "corr_matrix", "fd_violations",
    "table_diff", "diff_rows", "metric_anomalies", "sample_validate",
    "partition_completeness",
    "distinct_sketches", "merge_distinct_sketches",
    "quantile_sketches", "merge_quantile_sketches",
    "theta_sketches", "novelty_estimate",
]
