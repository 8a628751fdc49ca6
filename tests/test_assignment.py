"""Assignment solver vs brute force (SURVEY.md §5.2 item 1)."""

import numpy as np
import pytest

from schema_matching_spark.functions.assignment import (
    best_mapping,
    brute_force_mapping,
    hungarian,
    mapping_cost,
)


def _det_rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6])
def test_hungarian_square_matches_bruteforce(n):
    from itertools import permutations

    rng = _det_rng(n)
    cost = rng.random((n, n))
    assign = hungarian(cost)
    got = sum(cost[i, assign[i]] for i in range(n))
    best = min(sum(cost[i, p[i]] for i in range(n)) for p in permutations(range(n)))
    assert got == pytest.approx(best)
    assert sorted(assign) == list(range(n))


@pytest.mark.parametrize("ks,kt,seed", [(3, 3, 0), (4, 2, 1), (2, 5, 2), (6, 6, 3)])
def test_best_mapping_matches_bruteforce(ks, kt, seed):
    rng = _det_rng(seed)
    dist = rng.random((ks, kt))
    src = [f"s{i}" for i in range(ks)]
    tgt = [f"t{j}" for j in range(kt)]
    mapping = best_mapping(src, tgt, dist, unmatched_cost=0.35)
    got = mapping_cost(mapping, src, tgt, dist, unmatched_cost=0.35)
    best = brute_force_mapping(src, tgt, dist, unmatched_cost=0.35)
    assert got == pytest.approx(best)
    # injectivity
    used = [t for t in mapping.values() if t is not None]
    assert len(used) == len(set(used))


def test_unmatched_preferred_over_bad_match():
    dist = np.array([[0.9]])
    m = best_mapping(["s"], ["t"], dist, unmatched_cost=0.35)
    assert m["s"] is None


def test_good_match_preferred_over_unmatched():
    dist = np.array([[0.05]])
    m = best_mapping(["s"], ["t"], dist, unmatched_cost=0.35)
    assert m["s"] == "t"


def test_property_random_rectangular_matches_bruteforce():
    """Property test (hypothesis-style, deterministic seeds): on random
    rectangular matrices with random unmatched costs, the Hungarian
    solution's total cost equals exhaustive enumeration."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        ks=st.integers(1, 4),
        kt=st.integers(1, 4),
        seed=st.integers(0, 10_000),
        unmatched=st.floats(0.05, 0.9),
    )
    def check(ks, kt, seed, unmatched):
        rng = _det_rng(seed)
        dist = rng.random((ks, kt))
        src = [f"s{i}" for i in range(ks)]
        tgt = [f"t{j}" for j in range(kt)]
        mapping = best_mapping(src, tgt, dist, unmatched)
        got = mapping_cost(mapping, src, tgt, dist, unmatched)
        best = brute_force_mapping(src, tgt, dist, unmatched)
        assert got == pytest.approx(best)
        # injectivity
        taken = [t for t in mapping.values() if t is not None]
        assert len(taken) == len(set(taken))

    check()
