"""Driver-side algorithm core: sufficient-statistic blocks, PAVA, merging.

Mirrors the reference's core layering (/root/reference/src/MOBPY/core/) so
the stages are separately testable: groups -> PAVA blocks -> merged blocks.
"""

from .blocks import Block
from .constraints import BinningConstraints
from .merge import MergeMetrics, MergeScorer, MergeStrategy, merge_adjacent
from .pava import (
    GroupStats,
    PavaResult,
    apply_pava,
    build_initial_blocks,
    enforce_strict_monotonicity,
    fit_pava,
    resolve_sign,
    validate_monotonicity,
)
from .stats import (
    calculate_correlation,
    kendall_corr,
    norm_cdf,
    pearson_corr,
    spearman_corr,
    t_cdf,
    welch_two_tailed_pvalue,
    woe_iv,
)

__all__ = [
    "Block",
    "BinningConstraints",
    "GroupStats",
    "MergeMetrics",
    "MergeScorer",
    "MergeStrategy",
    "PavaResult",
    "apply_pava",
    "build_initial_blocks",
    "enforce_strict_monotonicity",
    "fit_pava",
    "merge_adjacent",
    "calculate_correlation",
    "kendall_corr",
    "norm_cdf",
    "pearson_corr",
    "resolve_sign",
    "spearman_corr",
    "t_cdf",
    "validate_monotonicity",
    "welch_two_tailed_pvalue",
    "woe_iv",
]
