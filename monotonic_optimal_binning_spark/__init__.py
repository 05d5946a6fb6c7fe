"""PySpark-native point-in-time feature-engineering engine with a
Monotonic-Optimal-Binning fitted-transform core.

Capabilities re-expressed Spark-first from the reference
ChenTaHung/Monotonic-Optimal-Binning (studied read-only at /root/reference),
plus the point-in-time layer (as-of join, backfill, lag/lead, sessionize)
and training-data-pipeline operators (dedup, similarity, text stats) the
north rule requires. No module-level Spark state: everything here is safe to
ship via ``spark-submit --py-files``.
"""

from .config import DEFAULT_CONFIG, EngineConfig
from .core.constraints import BinningConstraints
from .core.merge import MergeStrategy
from .exceptions import (
    ConstraintError,
    DataError,
    FittingError,
    MOBSparkError,
    NotFittedError,
)
from .logging_utils import BinningProgressLogger, get_logger, set_verbosity
from .operators.binning import (
    BinStats,
    FittedBins,
    GroupedBins,
    SparkMonotonicBinner,
    collect_group_stats,
    fit_binners_per_group,
    fit_groups_from_stats,
)
from .operators.model_diff import transform_churn, woe_shift_table
from .operators.scaling import (
    FeatureStats,
    clip,
    fit_feature_stats,
    impute,
    robust_scale,
    standardize,
)
from .scorecard import Scorecard

__version__ = "0.1.0"

__all__ = [
    "BinStats",
    "BinningConstraints",
    "BinningProgressLogger",
    "ConstraintError",
    "get_logger",
    "set_verbosity",
    "DataError",
    "DEFAULT_CONFIG",
    "EngineConfig",
    "FeatureStats",
    "FittedBins",
    "GroupedBins",
    "FittingError",
    "MergeStrategy",
    "MOBSparkError",
    "NotFittedError",
    "Scorecard",
    "SparkMonotonicBinner",
    "clip",
    "collect_group_stats",
    "fit_feature_stats",
    "fit_binners_per_group",
    "fit_groups_from_stats",
    "impute",
    "robust_scale",
    "standardize",
    "transform_churn",
    "woe_shift_table",
]
