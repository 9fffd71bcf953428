"""The canonical driver-hash-equivalent value comparator, shared by
the two local pre-validation gates (tests/test_oracle_parity.py and
tools/mini_driver.py) so they cannot drift apart again.

The driver hashes raw value bytes, so it is sensitive to things
Python's ``==`` ignores: the sign of zero (``-0.0 == 0.0`` is True but
the hashes differ — the round-6 ``williams_r_14`` red row happened
precisely because the local gates compared with ``==`` and said 50/50
while the driver said 49/50). Exact equality otherwise: no
tolerance, because the driver has none. NULL and NaN are mutually
equal: pandas materialization erases the NULL/NaN distinction (and
mixes None/np.nan sentinels across engines), so post-pandas the
comparator cannot and must not split them. Arrays
(embedding columns) compare element-wise — ``str()`` of a long numpy
array truncates with ``...`` and would silently pass differing tails.
"""

from __future__ import annotations

import math


def _is_seq(v) -> bool:
    import numpy as np

    return isinstance(v, (list, tuple, np.ndarray))


def _isna(v) -> bool:
    """Missing-value sentinel: pandas materializes SQL NULL as None
    (Spark toPandas, object columns) or float NaN (duckdb .df(), and
    any NULL in a float64 column) depending on engine and dtype — the
    underlying arrow value is NULL either way, so the driver sees them
    as equal and the comparator must too (an adversarial-probe false
    positive on a NULL boolean taught us this)."""
    return v is None or (isinstance(v, float) and math.isnan(v))


def values_match(a, b) -> bool:
    if _is_seq(a) or _is_seq(b):
        if not (_is_seq(a) and _is_seq(b)):
            return False
        return len(a) == len(b) and all(
            values_match(x, y) for x, y in zip(a, b)
        )
    if _isna(a) or _isna(b):
        return _isna(a) and _isna(b)
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return str(a) == str(b)
    if math.isnan(fa) and math.isnan(fb):
        return True
    if fa == fb:
        if fa == 0.0:
            return math.copysign(1.0, fa) == math.copysign(1.0, fb)
        return True
    return False
