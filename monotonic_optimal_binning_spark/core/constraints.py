"""Binning constraints with fit-time resolution of fractional specs.

Semantics match /root/reference/src/MOBPY/core/constraints.py:17-208 exactly
(validation rules, fraction-vs-absolute interpretation, caps at totals,
cross-checks, int truncation). The object is plain Python and is shipped to
the driver-side merge pass only — nothing here touches executors.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Optional

from ..exceptions import ConstraintError


@dataclass
class BinningConstraints:
    """Limits on bin counts / samples-per-bin / positives-per-bin.

    Values in (0, 1] for max_samples/min_samples/min_positives are fractions
    of the clean-partition totals, resolved by :meth:`resolve` at fit time;
    values > 1 are absolute counts (reference constraints.py:144-195).
    """

    max_bins: int = 6
    min_bins: int = 4
    max_samples: Optional[float] = None
    min_samples: Optional[float] = None
    min_positives: Optional[float] = None
    initial_pvalue: float = 0.4
    maximize_bins: bool = True

    abs_max_samples: Optional[int] = field(default=None, init=False)
    abs_min_samples: int = field(default=0, init=False)
    abs_min_positives: int = field(default=0, init=False)
    _resolved: bool = field(default=False, init=False)

    def __post_init__(self) -> None:
        if not isinstance(self.max_bins, int) or self.max_bins < 1:
            raise ConstraintError(
                f"max_bins must be an integer >= 1, got {self.max_bins}"
            )
        if not isinstance(self.min_bins, int) or self.min_bins < 1:
            raise ConstraintError(
                f"min_bins must be an integer >= 1, got {self.min_bins}"
            )
        if self.maximize_bins and self.min_bins > self.max_bins:
            raise ConstraintError(
                f"min_bins ({self.min_bins}) cannot exceed max_bins "
                f"({self.max_bins}) when maximize_bins=True"
            )
        if not 0 < self.initial_pvalue <= 1:
            raise ConstraintError(
                f"initial_pvalue must be in (0, 1], got {self.initial_pvalue}"
            )
        if self.max_samples is not None and self.max_samples <= 0:
            raise ConstraintError(
                f"max_samples must be positive, got {self.max_samples}"
            )
        if self.min_samples is not None and self.min_samples < 0:
            raise ConstraintError(
                f"min_samples cannot be negative, got {self.min_samples}"
            )
        if self.min_positives is not None and self.min_positives < 0:
            raise ConstraintError(
                f"min_positives cannot be negative, got {self.min_positives}"
            )

    def resolve(self, *, total_n: int, total_pos: int = 0) -> None:
        """Convert fractional specs to absolute counts against the data size.

        Matches reference constraints.py:118-208: int truncation, max(1,...)
        floor for fractional max_samples, caps at totals, min<=max cross-check,
        feasibility warning when min_samples forbids min_bins.
        """
        if total_n < 0:
            raise ValueError(f"total_n must be non-negative, got {total_n}")
        if total_pos < 0:
            raise ValueError(f"total_pos must be non-negative, got {total_pos}")

        if self.max_samples is None:
            self.abs_max_samples = None
        else:
            if 0 < self.max_samples <= 1:
                self.abs_max_samples = max(1, int(self.max_samples * total_n))
            else:
                self.abs_max_samples = int(self.max_samples)
            if total_n > 0:
                self.abs_max_samples = min(self.abs_max_samples, total_n)

        if self.min_samples is None:
            self.abs_min_samples = 0
        else:
            if 0 < self.min_samples <= 1:
                self.abs_min_samples = max(0, int(self.min_samples * total_n))
            else:
                self.abs_min_samples = max(0, int(self.min_samples))
            if total_n > 0:
                self.abs_min_samples = min(self.abs_min_samples, total_n)

        if self.abs_max_samples is not None:
            if self.abs_min_samples > self.abs_max_samples:
                raise ConstraintError(
                    f"min_samples ({self.abs_min_samples}) exceeds "
                    f"max_samples ({self.abs_max_samples}) after resolution"
                )

        if self.min_positives is None:
            self.abs_min_positives = 0
        else:
            if 0 < self.min_positives <= 1:
                self.abs_min_positives = max(0, int(self.min_positives * total_pos))
            else:
                self.abs_min_positives = max(0, int(self.min_positives))
            if total_pos > 0:
                self.abs_min_positives = min(self.abs_min_positives, total_pos)

        if self.abs_min_samples > 0 and total_n > 0:
            max_possible_bins = total_n // self.abs_min_samples
            if max_possible_bins < self.min_bins:
                warnings.warn(
                    f"With min_samples={self.abs_min_samples}, only "
                    f"{max_possible_bins} bins are possible, but "
                    f"min_bins={self.min_bins}. Some constraints may not be "
                    f"satisfied.",
                    UserWarning,
                )

        self._resolved = True

    def is_resolved(self) -> bool:
        return self._resolved

    def copy(self) -> "BinningConstraints":
        """Unresolved deep copy (reference constraints.py:218-235)."""
        return BinningConstraints(
            max_bins=self.max_bins,
            min_bins=self.min_bins,
            max_samples=self.max_samples,
            min_samples=self.min_samples,
            min_positives=self.min_positives,
            initial_pvalue=self.initial_pvalue,
            maximize_bins=self.maximize_bins,
        )
