"""Import-time stub for matplotlib so the reference MOBPY package (the test
oracle) can be imported. The parity tests never call plotting functions —
this only has to satisfy module-level ``import matplotlib...`` statements in
/root/reference/src/MOBPY/plot/. Any actual attribute access raises.
"""

import sys
import types


def _StubAttr(name):
    """Real (empty) class: safe inside typing annotations like Optional[Axes];
    instantiating or calling anything on it raises via __init__."""

    def _init(self, *a, **k):
        raise RuntimeError(f"matplotlib stub: '{name}' was used at runtime")

    return type(name.rsplit(".", 1)[-1], (), {"__init__": _init})


def _submodule(name):
    mod = types.ModuleType(name)
    mod.__getattr__ = lambda item, _n=name: _StubAttr(f"{_n}.{item}")
    sys.modules[name] = mod
    return mod


pyplot = _submodule("matplotlib.pyplot")
patches = _submodule("matplotlib.patches")
ticker = _submodule("matplotlib.ticker")
animation = _submodule("matplotlib.animation")
gridspec = _submodule("matplotlib.gridspec")
axes = _submodule("matplotlib.axes")
axes.Axes = _StubAttr("matplotlib.axes.Axes")
figure = _submodule("matplotlib.figure")
figure.Figure = _StubAttr("matplotlib.figure.Figure")
lines = _submodule("matplotlib.lines")
lines.Line2D = _StubAttr("matplotlib.lines.Line2D")
