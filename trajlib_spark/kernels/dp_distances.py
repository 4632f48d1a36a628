"""Trajectory similarity kernels: EDwP, LCSS, EDR, discrete Fréchet,
Hausdorff. Vectorized numpy DP where the recurrence allows; invoked inside
Arrow-batched pandas UDFs over a pair table (never a dense N×N matrix).

Provenance:
- EDwP follows the published algorithm ("Indexing and Matching Trajectories
  under Inconsistent Sampling Rates", Ranu et al., ICDE'15), matching the
  reference's DP formulation (/root/reference/trajlib/utils/edwp.py:66-156):
  value/delta matrices, replacement vs insertion scored by coverage, the
  tie-break preferring the longer trajectory's column edit.
- LCSS/EDR/Fréchet/Hausdorff are delegated by the reference to the external
  `traj_dist` C library (/root/reference/fedtraj/utils/
  preprocessing_porto.py:255-266); we implement the standard published
  definitions with the same ε convention (per-axis ε box for LCSS/EDR,
  normalized distances: LCSS → 1 - lcs/min(n,m), EDR → cost/max(n,m)).
"""

from __future__ import annotations

import math

import numpy as np


def _pdist(t1: np.ndarray, t2: np.ndarray) -> np.ndarray:
    """All-pairs Euclidean distance matrix [len(t1), len(t2)]."""
    d = t1[:, None, :] - t2[None, :, :]
    return np.sqrt((d * d).sum(axis=2))


# --- LCSS ------------------------------------------------------------------

def lcss_distance(t1: np.ndarray, t2: np.ndarray, eps: float) -> float:
    """1 - LCS/min(n, m); points match when both |Δx| < ε and |Δy| < ε."""
    n, m = len(t1), len(t2)
    if n == 0 or m == 0:
        return 1.0
    match = (np.abs(t1[:, None, 0] - t2[None, :, 0]) < eps) & (
        np.abs(t1[:, None, 1] - t2[None, :, 1]) < eps
    )
    prev = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.zeros(m + 1, dtype=np.int64)
        mrow = match[i - 1]
        for j in range(1, m + 1):
            if mrow[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return 1.0 - float(prev[m]) / min(n, m)


# --- EDR -------------------------------------------------------------------

def edr_distance(t1: np.ndarray, t2: np.ndarray, eps: float) -> float:
    """Edit Distance on Real sequences, normalized by max(n, m)."""
    n, m = len(t1), len(t2)
    if n == 0 and m == 0:
        return 0.0
    if n == 0 or m == 0:
        return 1.0
    match = (np.abs(t1[:, None, 0] - t2[None, :, 0]) < eps) & (
        np.abs(t1[:, None, 1] - t2[None, :, 1]) < eps
    )
    prev = np.arange(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        mrow = match[i - 1]
        for j in range(1, m + 1):
            sub = prev[j - 1] + (0 if mrow[j - 1] else 1)
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return float(prev[m]) / max(n, m)


def _match_matrix(t1: np.ndarray, t2: np.ndarray, eps: float) -> np.ndarray:
    return (np.abs(t1[:, None, 0] - t2[None, :, 0]) < eps) & (
        np.abs(t1[:, None, 1] - t2[None, :, 1]) < eps
    )


def lcss_distance_vec(t1: np.ndarray, t2: np.ndarray, eps: float) -> float:
    """Anti-diagonal LCS DP (integer-exact, equals lcss_distance):
    D[i,j] = max(D[i-1,j], D[i,j-1], D[i-1,j-1] + match)."""
    n, m = len(t1), len(t2)
    if n == 0 or m == 0:
        return 1.0
    match = _match_matrix(t1, t2, eps).astype(np.int64)
    D = np.zeros((n + 1, m + 1), dtype=np.int64)
    for d in range(2, n + m + 1):
        i = np.arange(max(1, d - m), min(n, d - 1) + 1)
        j = d - i
        D[i, j] = np.maximum(
            np.maximum(D[i - 1, j], D[i, j - 1]),
            D[i - 1, j - 1] + match[i - 1, j - 1],
        )
    return 1.0 - float(D[n, m]) / min(n, m)


def lcss_distance_block(T1: np.ndarray, T2: np.ndarray, eps: float) -> np.ndarray:
    """LCSS for a BLOCK of pairs at once: T1 [P, n, 2] vs T2 [P, m, 2]
    (equal lengths within the block) → [P] distances. Same anti-diagonal
    integer DP as lcss_distance_vec with the pair axis vectorized — the
    recurrence is integer-exact, so the per-pair results are identical;
    the win is amortizing the ~6 numpy calls per diagonal over P pairs
    instead of paying them per pair (round 9)."""
    P, n, _ = T1.shape
    m = T2.shape[1]
    if n == 0 or m == 0:
        return np.ones(P)
    match = (
        (np.abs(T1[:, :, None, 0] - T2[:, None, :, 0]) < eps)
        & (np.abs(T1[:, :, None, 1] - T2[:, None, :, 1]) < eps)
    ).astype(np.int32)
    D = np.zeros((P, n + 1, m + 1), dtype=np.int32)
    for d in range(2, n + m + 1):
        i = np.arange(max(1, d - m), min(n, d - 1) + 1)
        j = d - i
        D[:, i, j] = np.maximum(
            np.maximum(D[:, i - 1, j], D[:, i, j - 1]),
            D[:, i - 1, j - 1] + match[:, i - 1, j - 1],
        )
    return 1.0 - D[:, n, m].astype(np.float64) / min(n, m)


def edr_distance_block(T1: np.ndarray, T2: np.ndarray, eps: float) -> np.ndarray:
    """EDR for a BLOCK of equal-length pairs (see lcss_distance_block) —
    integer-exact, identical per-pair results to edr_distance_vec."""
    P, n, _ = T1.shape
    m = T2.shape[1]
    if n == 0 and m == 0:
        return np.zeros(P)
    if n == 0 or m == 0:
        return np.ones(P)
    miss = 1 - (
        (np.abs(T1[:, :, None, 0] - T2[:, None, :, 0]) < eps)
        & (np.abs(T1[:, :, None, 1] - T2[:, None, :, 1]) < eps)
    ).astype(np.int32)
    D = np.zeros((P, n + 1, m + 1), dtype=np.int32)
    D[:, 0, :] = np.arange(m + 1, dtype=np.int32)
    D[:, :, 0] = np.arange(n + 1, dtype=np.int32)
    for d in range(2, n + m + 1):
        i = np.arange(max(1, d - m), min(n, d - 1) + 1)
        j = d - i
        D[:, i, j] = np.minimum(
            np.minimum(D[:, i - 1, j] + 1, D[:, i, j - 1] + 1),
            D[:, i - 1, j - 1] + miss[:, i - 1, j - 1],
        )
    return D[:, n, m].astype(np.float64) / max(n, m)


def edr_distance_vec(t1: np.ndarray, t2: np.ndarray, eps: float) -> float:
    """Anti-diagonal EDR DP (integer-exact, equals edr_distance)."""
    n, m = len(t1), len(t2)
    if n == 0 and m == 0:
        return 0.0
    if n == 0 or m == 0:
        return 1.0
    miss = 1 - _match_matrix(t1, t2, eps).astype(np.int64)
    D = np.zeros((n + 1, m + 1), dtype=np.int64)
    D[0, :] = np.arange(m + 1)
    D[:, 0] = np.arange(n + 1)
    for d in range(2, n + m + 1):
        i = np.arange(max(1, d - m), min(n, d - 1) + 1)
        j = d - i
        D[i, j] = np.minimum(
            np.minimum(D[i - 1, j] + 1, D[i, j - 1] + 1),
            D[i - 1, j - 1] + miss[i - 1, j - 1],
        )
    return float(D[n, m]) / max(n, m)


# --- discrete Fréchet ------------------------------------------------------

def discrete_frechet(t1: np.ndarray, t2: np.ndarray) -> float:
    n, m = len(t1), len(t2)
    if n == 0 or m == 0:
        return math.inf
    d = _pdist(t1, t2)
    ca = np.empty((n, m))
    ca[0, 0] = d[0, 0]
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
        for j in range(1, m):
            ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])


# --- Hausdorff (point-to-segment, symmetric) --------------------------------

def _point_seg_dist(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance from each point row in p to segment (a, b), clamped."""
    ab = b - a
    l2 = float(ab @ ab)
    if l2 == 0.0:
        return np.hypot(p[:, 0] - a[0], p[:, 1] - a[1])
    t = np.clip(((p - a) @ ab) / l2, 0.0, 1.0)
    proj = a + t[:, None] * ab
    return np.hypot(p[:, 0] - proj[:, 0], p[:, 1] - proj[:, 1])


def _directed_hausdorff(t1: np.ndarray, t2: np.ndarray) -> float:
    """max over t1 points of min distance to t2's segments (t2 as a
    polyline; single-point t2 degrades to point distance)."""
    if len(t2) == 1:
        mins = np.hypot(t1[:, 0] - t2[0, 0], t1[:, 1] - t2[0, 1])
        return float(mins.max())
    best = np.full(len(t1), np.inf)
    for k in range(len(t2) - 1):
        best = np.minimum(best, _point_seg_dist(t1, t2[k], t2[k + 1]))
    return float(best.max())


def hausdorff_distance(t1: np.ndarray, t2: np.ndarray) -> float:
    if len(t1) == 0 or len(t2) == 0:
        return math.inf
    return max(_directed_hausdorff(t1, t2), _directed_hausdorff(t2, t1))


# --- EDwP ------------------------------------------------------------------

def _lmap(p1x, p1y, p2x, p2y, px, py):
    """Project p onto segment (p1, p2), clamped to endpoints
    (edwp.py:53-63). Squares via explicit multiplication: `x ** 2` on a
    float/np.float64 SCALAR routes through libm pow(), which on this
    platform is 1 ulp off the exact square for ~0.07% of inputs, while
    the numpy ARRAY path squares exactly — multiplication keeps the
    scalar kernel bitwise-identical to edwp_distance_vec."""
    dx = p1x - p2x
    dy = p1y - p2y
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        return px, py
    t = ((px - p1x) * (p2x - p1x) + (py - p1y) * (p2y - p1y)) / l2
    if t < 0:
        return p1x, p1y
    if t > 1:
        return p2x, p2y
    return p1x + t * (p2x - p1x), p1y + t * (p2y - p1y)


def _d(ax, ay, bx, by) -> float:
    # x*x, not x**2: scalar pow() is 1 ulp off the exact square for rare
    # inputs (see _lmap) — exact multiplication matches the array path
    dx = ax - bx
    dy = ay - by
    return math.sqrt(dx * dx + dy * dy)


def edwp_distance(t1: np.ndarray, t2: np.ndarray) -> float:
    """Edit Distance with Projections. Same recurrence/tie-breaks as the
    reference port of the authors' Java (edwp.py:66-156), restructured
    around per-cell edit-point tuples instead of stacked edit matrices."""
    t1 = np.asarray(t1, dtype=np.float64)
    t2 = np.asarray(t2, dtype=np.float64)
    n, m = len(t1), len(t2)
    big = np.finfo(np.float64).max
    e1 = np.sqrt(np.diff(t1[:, 0]) ** 2 + np.diff(t1[:, 1]) ** 2)  # t1 edge lengths
    e2 = np.sqrt(np.diff(t2[:, 0]) ** 2 + np.diff(t2[:, 1]) ** 2)
    total = float(e1.sum() + e2.sum())

    value = np.zeros((n, m))
    delta = np.zeros((n, m))
    value[0, 1:] = big
    value[1:, 0] = big
    # per-cell "edit points": row_edit (a point on t1), col_edit (on t2)
    row_ex = np.zeros((n, m)); row_ey = np.zeros((n, m))
    col_ex = np.zeros((n, m)); col_ey = np.zeros((n, m))

    for i in range(1, n):
        for j in range(1, m):
            row_score = col_score = big
            row_delta = col_delta = big
            row_ins = col_ins = None

            if i > 1:
                t1e_x, t1e_y = row_ex[i - 1, j], row_ey[i - 1, j]
                t2e_x, t2e_y = col_ex[i - 1, j], col_ey[i - 1, j]
                prev_edge = _d(t1e_x, t1e_y, t1[i - 1, 0], t1[i - 1, 1])
                ins = _lmap(t2e_x, t2e_y, t2[j, 0], t2[j, 1], t1[i - 1, 0], t1[i - 1, 1])
                edit_dist = _d(ins[0], ins[1], t1[i - 1, 0], t1[i - 1, 1])
                edit_edge = _d(t2e_x, t2e_y, ins[0], ins[1])
                cov1 = (edit_edge + prev_edge) / total
                cov2 = (_d(t2[j, 0], t2[j, 1], ins[0], ins[1]) + e1[i - 1]) / total
                row_delta = (
                    value[i - 1, j] - delta[i - 1, j]
                    + (edit_dist + _d(t1e_x, t1e_y, t2e_x, t2e_y)) * cov1
                )
                row_score = row_delta + (
                    edit_dist + _d(t2[j, 0], t2[j, 1], t1[i, 0], t1[i, 1])
                ) * cov2
                row_ins = ins

            if j > 1:
                t1e_x, t1e_y = row_ex[i, j - 1], row_ey[i, j - 1]
                t2e_x, t2e_y = col_ex[i, j - 1], col_ey[i, j - 1]
                prev_edge = _d(t2e_x, t2e_y, t2[j - 1, 0], t2[j - 1, 1])
                ins = _lmap(t1e_x, t1e_y, t1[i, 0], t1[i, 1], t2[j - 1, 0], t2[j - 1, 1])
                edit_dist = _d(ins[0], ins[1], t2[j - 1, 0], t2[j - 1, 1])
                edit_edge = _d(t1e_x, t1e_y, ins[0], ins[1])
                cov1 = (edit_edge + prev_edge) / total
                cov2 = (_d(t1[i, 0], t1[i, 1], ins[0], ins[1]) + e2[j - 1]) / total
                col_delta = (
                    value[i, j - 1] - delta[i, j - 1]
                    + (edit_dist + _d(t1e_x, t1e_y, t2e_x, t2e_y)) * cov1
                )
                col_score = col_delta + (
                    edit_dist + _d(t1[i, 0], t1[i, 1], t2[j, 0], t2[j, 1])
                ) * cov2
                col_ins = ins

            diag_cov = (e1[i - 1] + e2[j - 1]) / total
            diag_score = value[i - 1, j - 1] + (
                _d(t2[j, 0], t2[j, 1], t1[i, 0], t1[i, 1])
                + _d(t2[j - 1, 0], t2[j - 1, 1], t1[i - 1, 0], t1[i - 1, 1])
            ) * diag_cov

            if diag_score <= col_score and diag_score <= row_score:
                value[i, j] = diag_score
                delta[i, j] = diag_score - value[i - 1, j - 1]
                col_ex[i, j], col_ey[i, j] = t2[j - 1, 0], t2[j - 1, 1]
                row_ex[i, j], row_ey[i, j] = t1[i - 1, 0], t1[i - 1, 1]
            elif col_score < row_score or (col_score == row_score and m > n):
                value[i, j] = col_score
                delta[i, j] = col_score - col_delta
                col_ex[i, j], col_ey[i, j] = t2[j - 1, 0], t2[j - 1, 1]
                row_ex[i, j], row_ey[i, j] = col_ins
            else:
                value[i, j] = row_score
                delta[i, j] = row_score - row_delta
                col_ex[i, j], col_ey[i, j] = row_ins
                row_ex[i, j], row_ey[i, j] = t1[i - 1, 0], t1[i - 1, 1]

    return float(value[n - 1, m - 1])


def edwp_distance_vec(t1: np.ndarray, t2: np.ndarray) -> float:
    """Anti-diagonal-vectorized EDwP: bitwise-identical to edwp_distance
    (every per-cell float op keeps the same operand order; numpy just
    evaluates a whole diagonal of independent cells at once). ~10-40×
    faster on 50-200-point trajectories; validated exact-equal in tests."""
    t1 = np.asarray(t1, dtype=np.float64)
    t2 = np.asarray(t2, dtype=np.float64)
    n, m = len(t1), len(t2)
    if n < 2 or m < 2:
        return edwp_distance(t1, t2)
    big = np.finfo(np.float64).max
    e1 = np.sqrt((t1[1:, 0] - t1[:-1, 0]) ** 2 + (t1[1:, 1] - t1[:-1, 1]) ** 2)
    e2 = np.sqrt((t2[1:, 0] - t2[:-1, 0]) ** 2 + (t2[1:, 1] - t2[:-1, 1]) ** 2)
    total = float(e1.sum() + e2.sum())

    value = np.zeros((n, m)); delta = np.zeros((n, m))
    value[0, 1:] = big; value[1:, 0] = big
    row_ex = np.zeros((n, m)); row_ey = np.zeros((n, m))
    col_ex = np.zeros((n, m)); col_ey = np.zeros((n, m))

    def dist(ax, ay, bx, by):
        return np.sqrt((ax - bx) ** 2 + (ay - by) ** 2)

    def lmap(p1x, p1y, p2x, p2y, px, py):
        l2 = (p1x - p2x) ** 2 + (p1y - p2y) ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((px - p1x) * (p2x - p1x) + (py - p1y) * (p2y - p1y)) / l2
            ox = np.where(t < 0, p1x, np.where(t > 1, p2x, p1x + t * (p2x - p1x)))
            oy = np.where(t < 0, p1y, np.where(t > 1, p2y, p1y + t * (p2y - p1y)))
        ox = np.where(l2 == 0.0, px, ox)
        oy = np.where(l2 == 0.0, py, oy)
        return ox, oy

    for d in range(2, n + m - 2 + 1):
        i = np.arange(max(1, d - (m - 1)), min(n - 1, d - 1) + 1)
        j = d - i
        k = len(i)
        row_score = np.full(k, big); col_score = np.full(k, big)
        row_delta_v = np.full(k, big); col_delta_v = np.full(k, big)
        row_ins_x = np.zeros(k); row_ins_y = np.zeros(k)
        col_ins_x = np.zeros(k); col_ins_y = np.zeros(k)

        mr = i > 1
        if mr.any():
            ii, jj = i[mr], j[mr]
            t1e_x, t1e_y = row_ex[ii - 1, jj], row_ey[ii - 1, jj]
            t2e_x, t2e_y = col_ex[ii - 1, jj], col_ey[ii - 1, jj]
            prev_edge = dist(t1e_x, t1e_y, t1[ii - 1, 0], t1[ii - 1, 1])
            ins_x, ins_y = lmap(t2e_x, t2e_y, t2[jj, 0], t2[jj, 1],
                                t1[ii - 1, 0], t1[ii - 1, 1])
            edit_dist = dist(ins_x, ins_y, t1[ii - 1, 0], t1[ii - 1, 1])
            edit_edge = dist(t2e_x, t2e_y, ins_x, ins_y)
            cov1 = (edit_edge + prev_edge) / total
            cov2 = (dist(t2[jj, 0], t2[jj, 1], ins_x, ins_y) + e1[ii - 1]) / total
            rd = (value[ii - 1, jj] - delta[ii - 1, jj]
                  + (edit_dist + dist(t1e_x, t1e_y, t2e_x, t2e_y)) * cov1)
            rs = rd + (edit_dist + dist(t2[jj, 0], t2[jj, 1], t1[ii, 0], t1[ii, 1])) * cov2
            row_delta_v[mr] = rd; row_score[mr] = rs
            row_ins_x[mr] = ins_x; row_ins_y[mr] = ins_y

        mc = j > 1
        if mc.any():
            ii, jj = i[mc], j[mc]
            t1e_x, t1e_y = row_ex[ii, jj - 1], row_ey[ii, jj - 1]
            t2e_x, t2e_y = col_ex[ii, jj - 1], col_ey[ii, jj - 1]
            prev_edge = dist(t2e_x, t2e_y, t2[jj - 1, 0], t2[jj - 1, 1])
            ins_x, ins_y = lmap(t1e_x, t1e_y, t1[ii, 0], t1[ii, 1],
                                t2[jj - 1, 0], t2[jj - 1, 1])
            edit_dist = dist(ins_x, ins_y, t2[jj - 1, 0], t2[jj - 1, 1])
            edit_edge = dist(t1e_x, t1e_y, ins_x, ins_y)
            cov1 = (edit_edge + prev_edge) / total
            cov2 = (dist(t1[ii, 0], t1[ii, 1], ins_x, ins_y) + e2[jj - 1]) / total
            cd = (value[ii, jj - 1] - delta[ii, jj - 1]
                  + (edit_dist + dist(t1e_x, t1e_y, t2e_x, t2e_y)) * cov1)
            cs = cd + (edit_dist + dist(t1[ii, 0], t1[ii, 1], t2[jj, 0], t2[jj, 1])) * cov2
            col_delta_v[mc] = cd; col_score[mc] = cs
            col_ins_x[mc] = ins_x; col_ins_y[mc] = ins_y

        diag_cov = (e1[i - 1] + e2[j - 1]) / total
        diag_score = value[i - 1, j - 1] + (
            dist(t2[j, 0], t2[j, 1], t1[i, 0], t1[i, 1])
            + dist(t2[j - 1, 0], t2[j - 1, 1], t1[i - 1, 0], t1[i - 1, 1])
        ) * diag_cov

        take_diag = (diag_score <= col_score) & (diag_score <= row_score)
        take_col = ~take_diag & ((col_score < row_score)
                                 | ((col_score == row_score) & (m > n)))
        take_row = ~take_diag & ~take_col

        value[i, j] = np.select(
            [take_diag, take_col, take_row], [diag_score, col_score, row_score]
        )
        delta[i, j] = np.select(
            [take_diag, take_col, take_row],
            [diag_score - value[i - 1, j - 1], col_score - col_delta_v,
             row_score - row_delta_v],
        )
        col_ex[i, j] = np.where(take_row, row_ins_x, t2[j - 1, 0])
        col_ey[i, j] = np.where(take_row, row_ins_y, t2[j - 1, 1])
        row_ex[i, j] = np.where(take_col, col_ins_x, t1[i - 1, 0])
        row_ey[i, j] = np.where(take_col, col_ins_y, t1[i - 1, 1])

    return float(value[n - 1, m - 1])


KERNELS = {
    "edwp": edwp_distance_vec,
    "frechet": discrete_frechet,
    "hausdorff": hausdorff_distance,
}
