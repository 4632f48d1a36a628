"""TRACLUS trajectory partitioning, matching the reference implementation's
*observable behavior* (/root/reference/fedtraj/utils/trajclus.py:139-235).

Key structural fact about the reference: both MDL costs share the same LH
accumulation, so the cut test reduces to ``LH + LDH > LH`` — NOT simply
``LDH > 0``, because in float arithmetic a tiny LDH is absorbed by a large
LH (this matters on near-collinear data where LDH is rounding noise).
Both sums must therefore be accumulated in the reference's exact term
order. We do that *incrementally*: growing the window by one point appends
terms to both accumulators in the same order the reference's
from-scratch recomputation would produce, so the sums stay bitwise
identical while the kernel drops from the reference's O(L^4) per segment
to O(L^2). Validated cut-for-cut against the reference on random walks
including collinear and duplicate-point degeneracies.

Semantics notes preserved from the reference:
- window pairs: for curr = start+length, i ranges over [start, curr-2] and
  j over [start, i-2] (trajclus.py:153-156) — so segments shorter than 4
  points never cut;
- cut emits characteristic point curr-1 and restarts there
  (trajclus.py:222-225);
- first and last indices are always characteristic (trajclus.py:195, 230).

Segment cutting (/root/reference/fedtraj/model/trainer/utils.py:133-168):
consecutive characteristic indices (a, b) become one segment [a, b]
inclusive (segments overlap by one point).
"""

from __future__ import annotations

import math

import numpy as np


def _proj_on_line(px: float, py: float, ax: float, ay: float, bx: float, by: float):
    """Projection of p onto the (a, b) line; degenerate segment → a
    (trajclus.py:11-24 — that variant does NOT clamp t, and neither do we)."""
    vx, vy = bx - ax, by - ay
    l2 = vx * vx + vy * vy
    if l2 == 0:
        return ax, ay
    t = ((px - ax) * vx + (py - ay) * vy) / l2
    return ax + t * vx, ay + t * vy


def _perpendicular(l1: np.ndarray, l2: np.ndarray) -> float:
    """Lehmer mean of the shorter line's endpoint projection distances onto
    the longer line (trajclus.py:27-49)."""
    len1 = _euclid(l1[0, 0], l1[0, 1], l1[1, 0], l1[1, 1])
    len2 = _euclid(l2[0, 0], l2[0, 1], l2[1, 0], l2[1, 1])
    s, g = (l1, l2) if len1 < len2 else (l2, l1)
    d1 = _dist_to_proj(s[0], g)
    d2 = _dist_to_proj(s[1], g)
    if d1 == 0 and d2 == 0:
        return 0.0
    return (d1 * d1 + d2 * d2) / (d1 + d2)


def _euclid(ax: float, ay: float, bx: float, by: float) -> float:
    # NOT math.hypot: the reference computes sqrt(dx**2 + dy**2)
    # (trajclus.py:4-9) and its float noise decides cuts on degenerate
    # (collinear) data, so we must round identically.
    return math.sqrt((ax - bx) ** 2 + (ay - by) ** 2)


def _dist_to_proj(p: np.ndarray, line: np.ndarray) -> float:
    qx, qy = _proj_on_line(p[0], p[1], line[0, 0], line[0, 1], line[1, 0], line[1, 1])
    return _euclid(p[0], p[1], qx, qy)


def parallel_distance(l1: np.ndarray, l2: np.ndarray) -> float:
    """TRACLUS parallel distance (trajclus.py:52-72): project the shorter
    line's endpoints onto the longer line, take the min distance from each
    projection to the longer line's endpoints, then the min of the two.
    (The reference defines but never sums this into its MDL cost — kept as
    a first-class kernel for parity with the published TRACLUS triple.)"""
    len1 = _euclid(l1[0, 0], l1[0, 1], l1[1, 0], l1[1, 1])
    len2 = _euclid(l2[0, 0], l2[0, 1], l2[1, 0], l2[1, 1])
    s, g = (l1, l2) if len1 < len2 else (l2, l1)
    ps = _proj_on_line(s[0, 0], s[0, 1], g[0, 0], g[0, 1], g[1, 0], g[1, 1])
    pe = _proj_on_line(s[1, 0], s[1, 1], g[0, 0], g[0, 1], g[1, 0], g[1, 1])
    par1 = min(_euclid(g[0, 0], g[0, 1], *ps), _euclid(g[1, 0], g[1, 1], *ps))
    par2 = min(_euclid(g[0, 0], g[0, 1], *pe), _euclid(g[1, 0], g[1, 1], *pe))
    return min(par1, par2)


def _angular(l1: np.ndarray, l2: np.ndarray) -> float:
    """sin(min intersecting angle) * length(longer) via slope arithmetic
    (trajclus.py:75-135, directional=True path)."""
    len1 = _euclid(l1[0, 0], l1[0, 1], l1[1, 0], l1[1, 1])
    len2 = _euclid(l2[0, 0], l2[0, 1], l2[1, 0], l2[1, 1])
    s, g = (l1, l2) if len1 < len2 else (l2, l1)
    sdx, sdy = s[1, 0] - s[0, 0], s[1, 1] - s[0, 1]
    gdx, gdy = g[1, 0] - g[0, 0], g[1, 1] - g[0, 1]
    s_slope = sdy / sdx if sdx != 0 else math.inf
    g_slope = gdy / gdx if gdx != 0 else math.inf
    if math.isinf(s_slope):
        theta = min(abs(math.atan(g_slope)), abs(math.atan(-g_slope)))
    elif math.isinf(g_slope):
        theta = min(abs(math.atan(s_slope)), abs(math.atan(-s_slope)))
    else:
        den = 1 + s_slope * g_slope
        if den == 0:  # perpendicular lines: numpy gives ±inf → atan = ±π/2
            theta = math.pi / 2
        else:
            tan0 = (s_slope - g_slope) / den
            theta = min(abs(math.atan(tan0)), abs(math.atan(-tan0)))
    glen = _euclid(g[0, 0], g[0, 1], g[1, 0], g[1, 1])
    return math.sin(theta) * glen


def _lh_term(traj: np.ndarray, i: int) -> float:
    """max(0, log2(step length)) (trajclus.py:151-153). For a zero-length
    step the reference's np.log2(ed, where=ed>0) reads *uninitialized
    memory* (verified nondeterministic run-to-run), so the reference itself
    has no defined behavior there; we define the term as 0.0, which is the
    deterministic fixed point of max(0, ·). Parity with the reference is
    exact wherever the reference is deterministic (no duplicate consecutive
    points)."""
    ed = _euclid(traj[i, 0], traj[i, 1], traj[i + 1, 0], traj[i + 1, 1])
    return max(0.0, np.log2(ed)) if ed > 0.0 else 0.0


def _ldh_accumulate(traj: np.ndarray, start: int, i: int, ldh: float) -> float:
    """Fold the deviations of steps j against the chord (start → i) into the
    single running LDH accumulator, in the reference's exact += order
    (trajclus.py:154-169) — sub-summing would change the rounding."""
    chord = np.array([traj[start], traj[i]])
    for j in range(start, i - 1):
        step = np.array([traj[j], traj[j + 1]])
        ldh = ldh + _perpendicular(chord, step)
        ldh = ldh + _angular(chord, step)
    return ldh


def traclus_mask(traj: np.ndarray) -> np.ndarray:
    """Boolean characteristic-point mask, identical to the reference's
    traclus_partition second return value (trajclus.py:176-235)."""
    traj = np.asarray(traj, dtype=np.float64)
    n = len(traj)
    if n == 0:
        return np.zeros(0, dtype=bool)
    mask = np.zeros(n, dtype=bool)
    mask[0] = True
    start = 0
    length = 1
    lh = 0.0   # incremental MDL(no-partition) for the current window
    ldh = 0.0  # incremental deviation term
    next_i = 0  # first i whose terms are not yet accumulated
    while start + length < n:
        curr = start + length
        while next_i < curr - 1:
            lh = lh + _lh_term(traj, next_i)
            ldh = _ldh_accumulate(traj, start, next_i, ldh)
            next_i += 1
        if lh + ldh > lh:  # == cost_par > cost_nopar (trajclus.py:221)
            mask[curr - 1] = True
            start = curr - 1
            length = 1
            lh = 0.0
            ldh = 0.0
            next_i = start
        else:
            length += 1
    mask[n - 1] = True
    return mask


def cut_segments(mask: np.ndarray) -> list[tuple[int, int]]:
    """(start_idx, end_idx) inclusive per segment; consecutive cut indices
    overlap by one point (trainer/utils.py:150-162). A mask with a single
    True yields no segments (the reference drops 1-point trajectories);
    an all-False mask yields the whole range (trainer/utils.py:152-157)."""
    idx = np.flatnonzero(np.asarray(mask, dtype=bool))
    if len(idx) == 0:
        n = len(mask)
        return [(0, n - 1)] if n else []
    return [(int(idx[i]), int(idx[i + 1])) for i in range(len(idx) - 1)]
