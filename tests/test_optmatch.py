"""Optimal 1:1 assignment (functions/fuzzyjoin.py optimal_matching,
functions/evaluation.py _hungarian_matching).

Layers: the matching (not just its value) against exhaustive
permutation search on random rectangular matrices; the
strict-improvement-over-mutual-best property that motivates the
operator; the distributed path (bipartite CC -> per-component solve)
against the driver-side solver; and the component-width guard.
"""

from itertools import permutations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.evaluation import (
    _hungarian_matching,
    _hungarian_max,
)


def _brute_best(score):
    nr, nc = score.shape
    best = -1.0
    if nr <= nc:
        for perm in permutations(range(nc), nr):
            best = max(best, sum(score[i, j] for i, j in enumerate(perm)))
    else:
        for perm in permutations(range(nr), nc):
            best = max(best, sum(score[i, j] for j, i in enumerate(perm)))
    return best


def test_matching_achieves_bruteforce_optimum():
    rng = np.random.default_rng(19)
    for _ in range(20):
        nr, nc = rng.integers(1, 6, size=2)
        M = np.round(rng.random((nr, nc)), 3)
        matched = _hungarian_matching(M)
        total = sum(M[r, c] for r, c in matched)
        assert total == pytest.approx(_brute_best(M), abs=1e-9)
        # feasibility: 1:1 on both sides, real positive cells only
        assert len({r for r, _ in matched}) == len(matched)
        assert len({c for _, c in matched}) == len(matched)
        assert all(M[r, c] > 0 for r, c in matched)
        # value path agrees
        assert _hungarian_max(M) == pytest.approx(total, abs=1e-9)


def test_zero_cells_never_matched():
    M = np.array([[1.0, 0.0], [0.0, 0.0]])
    assert _hungarian_matching(M) == [(0, 0)]
    assert _hungarian_matching(np.zeros((3, 3))) == []


def _pairs_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "l_id": pa.array([r[0] for r in rows], pa.int64()),
                "r_id": pa.array([r[1] for r in rows], pa.int64()),
                "me": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    ).repartition(2)


@pytest.mark.usefixtures("ray_session")
def test_beats_mutual_best_greedy():
    from bern_ray.functions.fuzzyjoin import (
        one_to_one_match,
        optimal_matching,
    )

    # the classic forfeit: mutual-best keeps only (1,10)=2.0;
    # the optimum takes (1,11) + (2,10) = 3.8
    rows = [(1, 10, 2.0), (1, 11, 1.9), (2, 10, 1.9)]
    greedy = one_to_one_match(_pairs_ds(rows)).take_all()
    opt = optimal_matching(_pairs_ds(rows)).take_all()
    assert sum(r["me"] for r in greedy) == pytest.approx(2.0)
    assert sum(r["me"] for r in opt) == pytest.approx(3.8)
    assert {(r["l_id"], r["r_id"]) for r in opt} == {(1, 11), (2, 10)}


@pytest.mark.usefixtures("ray_session")
def test_distributed_matches_driver_solver():
    from bern_ray.functions.fuzzyjoin import optimal_matching

    rng = np.random.default_rng(29)
    rows = []
    # three components (disjoint id ranges), random bipartite scores
    for base in (0, 1000, 2000):
        for l in range(base, base + 5):
            for r in range(base + 500, base + 505):
                if rng.random() < 0.6:
                    rows.append((l, r, float(np.round(rng.random(), 3))))
    got = optimal_matching(_pairs_ds(rows)).take_all()
    got_total = sum(r["me"] for r in got)
    # driver-side reference per component
    want_total = 0.0
    for base in (0, 1000, 2000):
        comp = [r for r in rows if base <= r[0] < base + 500]
        if not comp:
            continue
        ul = sorted({r[0] for r in comp})
        ur = sorted({r[1] for r in comp})
        M = np.zeros((len(ul), len(ur)))
        for l, r, s in comp:
            M[ul.index(l), ur.index(r)] = max(
                M[ul.index(l), ur.index(r)], s
            )
        want_total += sum(M[r, c] for r, c in _hungarian_matching(M))
    assert got_total == pytest.approx(want_total, abs=1e-6)
    # 1:1 across the whole output
    assert len({r["l_id"] for r in got}) == len(got)
    assert len({r["r_id"] for r in got}) == len(got)


@pytest.mark.usefixtures("ray_session")
def test_component_width_guard():
    import bern_ray.functions.fuzzyjoin as fj

    rows = [(l, 10_000 + l % 3, 0.5) for l in range(30)]
    old = fj.OPTIMAL_MATCH_MAX_SIDE
    fj.OPTIMAL_MATCH_MAX_SIDE = 8
    try:
        with pytest.raises(Exception):
            fj.optimal_matching(_pairs_ds(rows)).take_all()
    finally:
        fj.OPTIMAL_MATCH_MAX_SIDE = old
