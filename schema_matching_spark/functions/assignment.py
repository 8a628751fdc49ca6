"""Minimum-cost column assignment (SURVEY.md §2.A A14).

The reference's ``get_best_schema_mapping`` searches for the injective
columns(A)→columns(B) mapping minimizing total distance (public repo's
__init__.py; branch-and-bound over permutations).  Here: the classic
O(n^3) Hungarian algorithm with row/column potentials — no scipy in
this sandbox, so hand-rolled and unit-tested against brute-force
enumeration for K ≤ 6 (tests/test_assignment.py).

"Map to nothing" (the decoy fixture, FIXTURES.md §3): the cost matrix
is padded with one virtual ∅-target per source column at cost
``unmatched_cost``; a source assigned to its ∅ column is unmapped.
Choosing unmatched_cost as the acceptance threshold makes the solver
prefer leaving a column unmapped over any match with distance above it.
"""

from __future__ import annotations

import numpy as np

INF = float("inf")


def hungarian(cost: np.ndarray) -> list[int]:
    """Solve square min-cost assignment; returns col index for each row.

    Potentials/shortest-augmenting-path formulation (the standard
    O(n^3) scheme also used by scipy's linear_sum_assignment).
    """
    n = cost.shape[0]
    assert cost.shape == (n, n)
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=int)  # p[j] = row matched to column j (1-based)
    way = np.zeros(n + 1, dtype=int)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0 != 0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    result = [-1] * n
    for j in range(1, n + 1):
        if p[j] != 0:
            result[p[j] - 1] = j - 1
    return result


def best_mapping(
    src_cols: list[str],
    tgt_cols: list[str],
    dist: np.ndarray,
    unmatched_cost: float = 0.35,
) -> dict[str, str | None]:
    """Injective partial mapping src→tgt minimizing total distance.

    ``dist`` is K_src × K_tgt.  Each source also gets a private ∅ option
    at ``unmatched_cost``; targets may stay unmatched for free (padding
    rows of zeros).
    """
    ks, kt = len(src_cols), len(tgt_cols)
    n = ks + kt  # square: real+virtual rows × real+∅ columns
    cost = np.zeros((n, n))
    cost[:ks, :kt] = dist
    cost[:ks, kt:] = INF
    for i in range(ks):
        cost[i, kt + i] = unmatched_cost  # private ∅ column per source
    # virtual rows (padding) can take any column at cost 0 — already zeros
    assign = hungarian(cost)
    out: dict[str, str | None] = {}
    for i, sc in enumerate(src_cols):
        j = assign[i]
        out[sc] = tgt_cols[j] if j < kt else None
    return out


def brute_force_mapping(
    src_cols: list[str],
    tgt_cols: list[str],
    dist: np.ndarray,
    unmatched_cost: float = 0.35,
) -> float:
    """Exhaustive minimum total cost (test oracle only, K ≤ 6)."""
    from itertools import permutations

    ks, kt = len(src_cols), len(tgt_cols)
    best = INF
    options = list(range(kt)) + [-1] * ks
    for perm in permutations(options, ks):
        used = [p for p in perm if p >= 0]
        if len(used) != len(set(used)):
            continue
        c = sum(
            dist[i, p] if p >= 0 else unmatched_cost for i, p in enumerate(perm)
        )
        best = min(best, c)
    return best


def mapping_cost(
    mapping: dict[str, str | None],
    src_cols: list[str],
    tgt_cols: list[str],
    dist: np.ndarray,
    unmatched_cost: float = 0.35,
) -> float:
    s_idx = {c: i for i, c in enumerate(src_cols)}
    t_idx = {c: j for j, c in enumerate(tgt_cols)}
    total = 0.0
    for sc, tc in mapping.items():
        total += unmatched_cost if tc is None else dist[s_idx[sc], t_idx[tc]]
    return total
