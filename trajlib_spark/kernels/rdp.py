"""Ramer-Douglas-Peucker polyline simplification, iterative (no recursion
limit), semantics equal to the reference's recursive version
(/root/reference/trajlib/utils/rdp.py:22-35): keep a point when the max
perpendicular distance to the chord is >= epsilon, splitting at the argmax
(first index wins ties, as numpy/py loops both yield the first strict max).
"""

from __future__ import annotations

import numpy as np


def _chord_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distance of each row of pts to the (a, b) chord; if the
    chord is degenerate, plain Euclidean distance to a
    (rdp.py:10-12)."""
    if a[0] == b[0] and a[1] == b[1]:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    num = np.abs((b[0] - a[0]) * (a[1] - pts[:, 1]) - (a[0] - pts[:, 0]) * (b[1] - a[1]))
    den = np.hypot(b[0] - a[0], b[1] - a[1])
    return num / den


def rdp_mask(points: np.ndarray, epsilon: float) -> np.ndarray:
    """Boolean keep-mask over the input points."""
    n = len(points)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        d = _chord_dist(points[lo + 1 : hi], points[lo], points[hi])
        k = int(np.argmax(d))
        if d[k] >= epsilon:
            mid = lo + 1 + k
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return keep


def rdp(points: np.ndarray, epsilon: float) -> np.ndarray:
    points = np.asarray(points, dtype=np.float64)
    return points[rdp_mask(points, epsilon)]
