"""Error hierarchy for the engine.

Mirrors the reference's error taxonomy (/root/reference/src/MOBPY/exceptions.py)
so callers migrating from the reference can keep their except clauses.
"""

from __future__ import annotations


class MOBSparkError(Exception):
    """Base class for all engine errors."""


class DataError(MOBSparkError):
    """Invalid input data (missing columns, non-numeric, ±inf, empty clean)."""


class ConstraintError(MOBSparkError):
    """Invalid or contradictory binning constraints."""


class FittingError(MOBSparkError):
    """Algorithm failure (non-monotone PAVA output, merge over max_bins, ...)."""


class NotFittedError(MOBSparkError):
    """Accessor called before fit()."""
