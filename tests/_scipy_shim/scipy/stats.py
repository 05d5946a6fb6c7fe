"""scipy.stats shim: just ``t.cdf`` and ``norm.cdf`` (see package docstring)."""

import numpy as _np

from monotonic_optimal_binning_spark.core.stats import norm_cdf as _norm_cdf
from monotonic_optimal_binning_spark.core.stats import t_cdf as _t_cdf


class _TDist:
    @staticmethod
    def cdf(x, df):
        if _np.ndim(x) == 0 and _np.ndim(df) == 0:
            return _t_cdf(float(x), float(df))
        x_arr = _np.broadcast_to(_np.asarray(x, dtype=float), _np.shape(x) or (1,))
        df_arr = _np.broadcast_to(_np.asarray(df, dtype=float), x_arr.shape)
        return _np.array([_t_cdf(float(a), float(b)) for a, b in zip(x_arr, df_arr)])


class _NormDist:
    @staticmethod
    def cdf(x):
        if _np.ndim(x) == 0:
            return _norm_cdf(float(x))
        return _np.array([_norm_cdf(float(v)) for v in _np.asarray(x, dtype=float)])


t = _TDist()
norm = _NormDist()
