"""label_propagation: distributed synchronous LPA vs the scalar
reference on planted and random graphs (min-label tie-break, fixed
rounds, oscillation-prone structures included)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.graph import (
    label_propagation,
    label_propagation_reference,
)


def _run(edge_pairs, rounds):
    a = pa.array([e[0] for e in edge_pairs], type=pa.int64())
    b = pa.array([e[1] for e in edge_pairs], type=pa.int64())
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(3)
    out = label_propagation(ds, rounds=rounds).to_pandas()
    return dict(zip(out["node"], out["community"]))


@pytest.mark.usefixtures("ray_session")
def test_two_cliques_with_bridge():
    # two 4-cliques joined by one bridge edge: LPA pulls each side to
    # its min node; the bridge does not merge them
    c1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    c2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    got = _run(edges, rounds=4)
    want = label_propagation_reference(edges, rounds=4)
    assert got == want
    # communities are separated
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(10, 14)}) == 1
    assert got[0] != got[11]


@pytest.mark.usefixtures("ray_session")
def test_random_fuzz_vs_reference():
    rng = np.random.RandomState(3)
    for trial in range(5):
        n = 20
        m = 40
        edges = set()
        while len(edges) < m:
            a, b = rng.randint(0, n, 2)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        for rounds in (1, 3):
            got = _run(edges, rounds=rounds)
            want = label_propagation_reference(edges, rounds=rounds)
            assert got == want, (trial, rounds)
