"""Minimal scipy shim so the reference MOBPY (the test oracle) can import.

scipy is not installed in this runtime; the reference only uses
``scipy.stats.t.cdf`` and ``scipy.stats.norm.cdf``
(/root/reference/src/MOBPY/core/merge.py:278,282). We back those with the
engine's own pure-Python Student-t / normal CDFs, which are independently
validated against closed forms (Cauchy df=1, df=2, normal limit) in
tests/test_stats.py — so parity tests still exercise the full reference
pipeline semantics.
"""

from . import stats  # noqa: F401

__version__ = "0.0.0-shim"
