"""HAC linkages (functions/graphcluster.py _hac_rows / cluster_edges
complete_link / average_link).

Layers: a DENSE-matrix agglomerative reference (linkage recomputed
from scratch over member cross-products each round — independent of
the sparse Lance-Williams fold); the chain-cutting behavior that
motivates HAC over connected components; and the distributed path
(CC -> per-component map_groups) against the kernel.
"""

from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.graphcluster import _hac_rows, cluster_edges


def _dense_ref(edges, threshold, linkage):
    """Dense reference: clusters as frozensets; each round recompute
    every cluster-pair linkage from the raw score matrix (missing
    pair = -inf for complete, 0 for average), merge the best, ties to
    the smallest (min-id, min-id) root pair."""
    score = {}
    nodes = set()
    for x, y, s in edges:
        score[(min(x, y), max(x, y))] = s
        nodes.update((x, y))
    clusters = {n: {n} for n in sorted(nodes)}

    def link(ra, rb):
        vals = []
        for u in clusters[ra]:
            for v in clusters[rb]:
                k = (min(u, v), max(u, v))
                if k in score:
                    vals.append(score[k])
                else:
                    if linkage == "complete":
                        return float("-inf")
                    vals.append(0.0)
        return min(vals) if linkage == "complete" else sum(vals) / len(vals)

    while True:
        best = None
        for ra, rb in combinations(sorted(clusters), 2):
            v = link(ra, rb)
            if v < threshold:
                continue
            if best is None or v > best[0] or (v == best[0] and (ra, rb) < best[1]):
                best = (v, (ra, rb))
        if best is None:
            break
        ra, rb = best[1]
        clusters[ra] |= clusters.pop(rb)
    out = {}
    for root, mem in clusters.items():
        for n in mem:
            out[n] = root
    return out


def _kernel(edges, threshold, linkage):
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    s = np.array([e[2] for e in edges], dtype=np.float64)
    n, c, _h = _hac_rows(a, b, s, threshold, linkage)
    return dict(zip(n, c))


@pytest.mark.parametrize("linkage", ["complete", "average"])
def test_kernel_matches_dense_reference(linkage):
    rng = np.random.default_rng(17)
    for trial in range(6):
        n_nodes = 10
        pairs = list(combinations(range(n_nodes), 2))
        keep = rng.random(len(pairs)) < 0.35
        edges = [
            (x, y, float(np.round(rng.random() * 0.5 + 0.5, 3)))
            for (x, y), k in zip(pairs, keep)
            if k
        ]
        if not edges:
            continue
        got = _kernel(edges, 0.75, linkage)
        want = _dense_ref(edges, 0.75, linkage)
        assert got == want, (trial, linkage)


def test_complete_link_cuts_chains():
    # a-b and b-c are strong edges, a-c missing: CC welds all three,
    # complete-link refuses the second merge (a-c is -inf)
    edges = [(1, 2, 0.9), (2, 3, 0.9)]
    got = _kernel(edges, 0.85, "complete")
    assert got[1] == got[2] != got[3]
    # average linkage blocks too at 0.85 ((0.9 + 0)/2 = 0.45) ...
    got = _kernel(edges, 0.85, "average")
    assert got[1] == got[2] != got[3]
    # ... but merges at a permissive threshold
    got = _kernel(edges, 0.4, "average")
    assert got[1] == got[2] == got[3]
    # a full triangle merges under both
    tri = [(1, 2, 0.9), (2, 3, 0.9), (1, 3, 0.9)]
    for lk in ("complete", "average"):
        got = _kernel(tri, 0.85, lk)
        assert got[1] == got[2] == got[3] == 1


def test_deterministic_tie_break():
    # two disjoint equal-score edges: both merge, labels are min ids
    edges = [(3, 4, 0.9), (1, 2, 0.9)]
    got = _kernel(edges, 0.5, "complete")
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


@pytest.mark.usefixtures("ray_session")
def test_distributed_matches_kernel():
    rng = np.random.default_rng(23)
    edges = []
    # three planted components with in-component random edges
    for base in (0, 100, 200):
        pairs = list(combinations(range(base, base + 8), 2))
        keep = rng.random(len(pairs)) < 0.4
        edges += [
            (x, y, float(np.round(rng.random() * 0.5 + 0.5, 3)))
            for (x, y), k in zip(pairs, keep)
            if k
        ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id_a": pa.array([e[0] for e in edges], pa.int64()),
                "doc_id_b": pa.array([e[1] for e in edges], pa.int64()),
                "score": pa.array([e[2] for e in edges], pa.float64()),
            }
        )
    ).repartition(3)
    for lk in ("complete_link", "average_link"):
        rows = cluster_edges(ds, lk, threshold=0.75).take_all()
        got = {r["node_id"]: r["cluster_id"] for r in rows}
        want = _kernel(edges, 0.75, lk.split("_", 1)[0])
        assert got == want, lk
        # is_center marks exactly the label representative
        for r in rows:
            assert r["is_center"] == (r["node_id"] == r["cluster_id"])


def test_threshold_required():
    import ray.data as rd

    ds = rd.from_items([{"doc_id_a": 1, "doc_id_b": 2, "score": 0.9}])
    with pytest.raises(ValueError):
        cluster_edges(ds, "complete_link")
