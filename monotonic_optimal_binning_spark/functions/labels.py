"""Bin-edge / bucket label formatting.

Byte-for-byte compatible with the reference formatter
(/root/reference/src/MOBPY/binning/mob.py:30-48, label assembly at
mob.py:453-459 and mob.py:613-615). Label text is load-bearing: the
reference keys its WoE lookup by the formatted label and the parity tests
compare labels exactly.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np


def format_edge(val: float) -> str:
    """-inf/+inf sentinels; scientific %.2e outside [0.01, 1000]; %.4g inside."""
    if math.isinf(val):
        return "-inf" if val < 0 else "+inf"
    if abs(val) < 0.01 or abs(val) > 1000:
        return f"{val:.2e}"
    return f"{val:.4g}"


def make_bucket_label(left: float, right: float) -> str:
    """Half-open interval label; the -inf bin renders with an open paren."""
    label = f"[{format_edge(left)}, {format_edge(right)})"
    if math.isinf(left) and left < 0:
        label = "(" + label[1:]
    return label


def bucket_labels(lefts: np.ndarray, rights: np.ndarray) -> List[str]:
    return [make_bucket_label(l, r) for l, r in zip(lefts, rights)]
