"""Driver-side adjacent-block merging with statistical scoring.

Runs after PAVA on at most a few hundred sufficient-statistic blocks — a
bounded O(k·iterations) driver pass (SURVEY.md §2.6). The cluster never sees
this loop; it only ever computed the group statistics feeding it.

Semantics match /root/reference/src/MOBPY/core/merge.py:
  - Welch t-test scorer with Welch–Satterthwaite df clamped to
    [1, na+nb-2] and documented edge cases (merge.py:230-284)
  - SMALLEST_LOSS / BALANCED_SIZE alternative scorers (merge.py:286-351)
  - multiplicative constraint penalties with the exact constants
    ×1.5 (undersized), ×1.3 (binary-extreme rate), ×max(0.1, 1/violation)
    (oversized merge), ×1.4 (under min_positives) (merge.py:353-404)
  - phase 1 greedy statistical loop with the maximize_bins /
    initial_pvalue / half-pvalue decision rule (merge.py:486-572)
  - phase 2 min-samples sweep merging the first undersized block with its
    better-scoring neighbor (merge.py:892-967)
  - tie-breaking: the scan keeps the FIRST maximal score (strict '>',
    merge.py:595-602) — load-bearing for parity
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Tuple

from ..config import DEFAULT_CONFIG, EngineConfig
from ..exceptions import FittingError
from .blocks import Block
from .constraints import BinningConstraints
from .stats import norm_cdf, welch_two_tailed_pvalue


class MergeStrategy(Enum):
    HIGHEST_PVALUE = "highest_pvalue"
    SMALLEST_LOSS = "smallest_loss"
    BALANCED_SIZE = "balanced_size"


@dataclass
class MergeMetrics:
    """Observability counters for the merge pass (north_rule requires
    merge-iteration metrics in job lineage)."""

    phase1_iterations: int = 0
    phase2_iterations: int = 0
    initial_blocks: int = 0
    final_blocks: int = 0
    scores: List[float] = field(default_factory=list)


class MergeScorer:
    """Scores a candidate merge of two adjacent blocks; higher = merge first."""

    def __init__(
        self,
        constraints: BinningConstraints,
        is_binary_y: bool,
        strategy: MergeStrategy = MergeStrategy.HIGHEST_PVALUE,
        config: EngineConfig = DEFAULT_CONFIG,
    ):
        self.constraints = constraints
        self.is_binary_y = is_binary_y
        self.strategy = strategy
        self.config = config

    def score_pair(self, a: Block, b: Block) -> float:
        if self.strategy == MergeStrategy.SMALLEST_LOSS:
            base = 1.0 / (1.0 + self._information_loss(a, b))
        elif self.strategy == MergeStrategy.BALANCED_SIZE:
            base = self._size_balance_score(a, b)
        else:
            base = self._two_sample_pvalue(a, b)
        return self._apply_penalties(base, a, b)

    def _two_sample_pvalue(self, a: Block, b: Block) -> float:
        """Welch's t-test p-value with the reference's edge cases.

        n=0 on either side -> 1.0; n=1 & n=1 -> 1.0 if means equal else 0.5;
        zero pooled SE -> 1.0 if means equal else 0.0 (merge.py:242-260).
        """
        na, nb = a.n, b.n
        eps = self.config.epsilon
        if na == 0 or nb == 0:
            return 1.0
        if na == 1 and nb == 1:
            return 1.0 if abs(a.mean - b.mean) < eps else 0.5

        va, vb = a.var, b.var
        se_diff_sq = va / na + vb / nb
        if se_diff_sq <= 0:
            return 1.0 if abs(a.mean - b.mean) < eps else 0.0

        t_stat = abs(a.mean - b.mean) / math.sqrt(se_diff_sq)

        if va > 0 and vb > 0:
            df_num = se_diff_sq**2
            df_denom = (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
            df = df_num / df_denom
            df = max(1, min(df, na + nb - 2))
        else:
            df = na + nb - 2

        try:
            p_value = welch_two_tailed_pvalue(t_stat, df)
        except Exception:
            p_value = 2.0 * (1.0 - norm_cdf(abs(t_stat)))
        return float(min(max(p_value, 0.0), 1.0))

    def _information_loss(self, a: Block, b: Block) -> float:
        """ΔWSS of the merge, normalized by size-weighted pooled variance
        (merge.py:286-319)."""
        ss_a = a.sum2 - a.sum**2 / a.n if a.n > 0 else 0.0
        ss_b = b.sum2 - b.sum**2 / b.n if b.n > 0 else 0.0
        current_ss = ss_a + ss_b
        merged_n = a.n + b.n
        merged_sum = a.sum + b.sum
        merged_sum2 = a.sum2 + b.sum2
        merged_ss = merged_sum2 - merged_sum**2 / merged_n if merged_n > 0 else 0.0
        loss = max(0.0, merged_ss - current_ss)
        total_var = (
            (a.var * a.n + b.var * b.n) / (a.n + b.n) if (a.n + b.n) > 0 else 1.0
        )
        return loss / max(total_var, self.config.epsilon)

    def _size_balance_score(self, a: Block, b: Block) -> float:
        """min/max size ratio × oversize penalty (merge.py:321-351)."""
        max_n = max(a.n, b.n)
        min_n = min(a.n, b.n)
        if max_n == 0:
            return 1.0
        balance = min_n / max_n
        total_n = a.n + b.n
        if self.constraints.abs_max_samples:
            size_penalty = min(1.0, self.constraints.abs_max_samples / total_n)
        else:
            size_penalty = min(1.0, 1000 / total_n)
        return balance * size_penalty

    def _apply_penalties(self, base_score: float, a: Block, b: Block) -> float:
        """Multiplicative constraint adjustments (merge.py:353-404)."""
        score = base_score
        constraints = self.constraints

        if constraints.abs_min_samples > 0:
            if a.n < constraints.abs_min_samples:
                score *= 1.5
            if b.n < constraints.abs_min_samples:
                score *= 1.5

        if self.is_binary_y:
            if a.mean <= 0.001 or a.mean >= 0.999:
                score *= 1.3
            if b.mean <= 0.001 or b.mean >= 0.999:
                score *= 1.3

        if constraints.abs_max_samples:
            merged_n = a.n + b.n
            if merged_n > constraints.abs_max_samples:
                violation_ratio = merged_n / constraints.abs_max_samples
                score *= max(0.1, 1.0 / violation_ratio)

        if self.is_binary_y and constraints.abs_min_positives > 0:
            if a.sum < constraints.abs_min_positives:
                score *= 1.4
            if b.sum < constraints.abs_min_positives:
                score *= 1.4

        return score


def _find_best_merge(
    blocks: List[Block], scorer: MergeScorer
) -> Tuple[Optional[int], float]:
    """First-max-wins argmax scan over adjacent pairs (merge.py:575-602)."""
    if len(blocks) < 2:
        return None, -1.0
    best_idx: Optional[int] = None
    best_score = -1.0
    for i in range(len(blocks) - 1):
        score = scorer.score_pair(blocks[i], blocks[i + 1])
        if score > best_score:
            best_score = score
            best_idx = i
    return best_idx, best_score


def _merge_at(blocks: List[Block], idx: int) -> List[Block]:
    if idx < 0 or idx >= len(blocks) - 1:
        raise IndexError(f"Invalid merge index {idx} for {len(blocks)} blocks")
    merged_block = blocks[idx].merge_with(blocks[idx + 1])
    return blocks[:idx] + [merged_block] + blocks[idx + 2 :]


def _snapshot(blocks: List[Block]) -> List[dict]:
    """Per-iteration block snapshot for merge lineage
    (reference core/merge.py:629-638)."""
    return [b.as_dict() for b in blocks]


def _statistical_merge_phase(
    blocks: List[Block],
    constraints: BinningConstraints,
    scorer: MergeScorer,
    max_iterations: int,
    metrics: MergeMetrics,
    history: Optional[List[List[dict]]] = None,
) -> List[Block]:
    """Phase 1 greedy loop (merge.py:486-572).

    maximize_bins=True: merge the best pair while over max_bins (the score
    threshold is never consulted below max_bins — the loop breaks first).
    maximize_bins=False: merge while score >= initial_pvalue, or while above
    min_bins and score >= initial_pvalue/2.
    """
    current = list(blocks)
    iteration = 0

    while iteration < max_iterations and len(current) > 1:
        if constraints.maximize_bins:
            should_continue = len(current) > constraints.max_bins
        else:
            should_continue = True
        if not should_continue and constraints.maximize_bins:
            break

        best_idx, best_score = _find_best_merge(current, scorer)
        if best_idx is None:
            break

        should_merge = False
        if constraints.maximize_bins and len(current) > constraints.max_bins:
            should_merge = True
        elif best_score >= constraints.initial_pvalue:
            should_merge = True
        elif not constraints.maximize_bins and len(current) > constraints.min_bins:
            should_merge = best_score >= constraints.initial_pvalue * 0.5

        if should_merge:
            current = _merge_at(current, best_idx)
            metrics.scores.append(best_score)
            if history is not None:
                history.append(_snapshot(current))
        else:
            break
        iteration += 1

    metrics.phase1_iterations = iteration
    if iteration >= max_iterations:
        warnings.warn(
            f"Statistical merge phase reached max iterations ({max_iterations})",
            UserWarning,
        )
    return current


def _enforce_min_samples(
    blocks: List[Block],
    constraints: BinningConstraints,
    scorer: MergeScorer,
    metrics: MergeMetrics,
    history: Optional[List[List[dict]]] = None,
) -> List[Block]:
    """Phase 2 sweep (merge.py:892-967): merge the first undersized block
    with its better-scoring neighbor until none remain or min_bins reached."""
    current = list(blocks)
    if constraints.abs_min_samples <= 0:
        return current

    max_iterations = len(blocks) * 2
    iteration = 0
    while iteration < max_iterations:
        if len(current) <= max(1, constraints.min_bins):
            break
        undersized = [
            i for i, b in enumerate(current) if b.n < constraints.abs_min_samples
        ]
        if not undersized:
            break
        idx = undersized[0]
        if idx == 0:
            merge_idx = 0
        elif idx == len(current) - 1:
            merge_idx = idx - 1
        else:
            left_score = scorer.score_pair(current[idx - 1], current[idx])
            right_score = scorer.score_pair(current[idx], current[idx + 1])
            merge_idx = idx if right_score >= left_score else idx - 1
        current = _merge_at(current, merge_idx)
        if history is not None:
            history.append(_snapshot(current))
        iteration += 1
        if iteration >= max_iterations:
            warnings.warn(
                f"Min-samples enforcement reached maximum iterations "
                f"({max_iterations})",
                UserWarning,
            )
    metrics.phase2_iterations = iteration
    return current


def _validate_merge_result(
    blocks: List[Block], constraints: BinningConstraints
) -> None:
    """Hard error on max_bins violation in maximize mode; advisory warnings
    mirroring the reference's check set (merge.py:641-685: missing ±inf
    edges, undersized bins past min_bins, oversized bins)."""
    if constraints.maximize_bins and len(blocks) > constraints.max_bins:
        raise FittingError(
            f"Merge failed: {len(blocks)} blocks exceeds "
            f"max_bins={constraints.max_bins}"
        )
    if not blocks:
        return
    if blocks[0].left != float("-inf"):
        warnings.warn(
            f"First block does not start at -inf (starts at {blocks[0].left})",
            UserWarning,
        )
    if blocks[-1].right != float("inf"):
        warnings.warn(
            f"Last block does not end at +inf (ends at {blocks[-1].right})",
            UserWarning,
        )
    undersized = [b for b in blocks if b.n < constraints.abs_min_samples]
    if undersized and len(blocks) > constraints.min_bins:
        warnings.warn(
            f"{len(undersized)} blocks have fewer than "
            f"{constraints.abs_min_samples} samples",
            UserWarning,
        )
    oversized = [
        b
        for b in blocks
        if constraints.abs_max_samples and b.n > constraints.abs_max_samples
    ]
    if oversized:
        warnings.warn(
            f"{len(oversized)} blocks exceed "
            f"max_samples={constraints.abs_max_samples}",
            UserWarning,
        )


def merge_adjacent(
    blocks: List[Block],
    constraints: BinningConstraints,
    is_binary_y: bool,
    *,
    strategy: MergeStrategy = MergeStrategy.HIGHEST_PVALUE,
    max_iterations: Optional[int] = None,
    config: EngineConfig = DEFAULT_CONFIG,
    metrics: Optional[MergeMetrics] = None,
    history: Optional[List[List[dict]]] = None,
) -> List[Block]:
    """Two-phase constraint-aware merge of PAVA blocks (merge.py:407-483).

    ``history``, when a list, receives one block-table snapshot per merge
    iteration across both phases (reference merge.py:413,545-546,952-953) —
    the per-iteration lineage the north rule asks for.
    """
    if not blocks:
        return []
    metrics = metrics if metrics is not None else MergeMetrics()
    metrics.initial_blocks = len(blocks)

    current = list(blocks)
    scorer = MergeScorer(constraints, is_binary_y, strategy, config)
    max_iter = max_iterations or constraints.max_bins * 100

    current = _statistical_merge_phase(
        current, constraints, scorer, max_iter, metrics, history
    )
    if constraints.abs_min_samples > 0:
        current = _enforce_min_samples(current, constraints, scorer, metrics, history)

    if len(current) == 0:
        raise FittingError("Merging produced zero blocks")
    _validate_merge_result(current, constraints)
    metrics.final_blocks = len(current)
    return current
