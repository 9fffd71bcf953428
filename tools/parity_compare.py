"""The canonical driver-hash-equivalent value comparator, shared by
the two local pre-validation gates (tests/test_oracle_parity.py and
tools/mini_driver.py) so they cannot drift apart again.

The driver hashes raw value bytes, so it is sensitive to things
Python's ``==`` ignores: the sign of zero (``-0.0 == 0.0`` is True but
the hashes differ — the round-6 ``williams_r_14`` red row happened
precisely because the local gates compared with ``==`` and said 50/50
while the driver said 49/50) and the sign of NaN. Exact equality
otherwise: no tolerance, because the driver has none. Arrays
(embedding columns) compare element-wise — ``str()`` of a long numpy
array truncates with ``...`` and would silently pass differing tails.
"""

from __future__ import annotations

import math


def _is_seq(v) -> bool:
    import numpy as np

    return isinstance(v, (list, tuple, np.ndarray))


def values_match(a, b) -> bool:
    if _is_seq(a) or _is_seq(b):
        if not (_is_seq(a) and _is_seq(b)):
            return False
        return len(a) == len(b) and all(
            values_match(x, y) for x, y in zip(a, b)
        )
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return str(a) == str(b)
    if math.isnan(fa) and math.isnan(fb):
        return math.copysign(1.0, fa) == math.copysign(1.0, fb)
    if fa == fb:
        if fa == 0.0:
            return math.copysign(1.0, fa) == math.copysign(1.0, fb)
        return True
    return False
