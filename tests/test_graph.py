"""Distributed triangle counting vs a brute-force reference."""

import random

import pandas as pd
import pytest

from bern_ray.functions.graph import (
    cooccurrence_edges,
    triangle_stats,
    triangle_stats_reference,
)


def _run(edge_pairs, ray_session, num_buckets=8):
    import ray.data

    df = pd.DataFrame(sorted(set(edge_pairs)), columns=["a", "b"])
    ds = ray.data.from_pandas(df).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    out = (
        triangle_stats(ds, num_buckets=num_buckets)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return out


def test_triangles_planted_shapes(ray_session):
    # K4 clique (coef 1.0 everywhere), star (coef 0), chain, plus a
    # triangle sharing one node with the star hub
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (10, 11), (10, 12), (10, 13), (10, 14),          # star at 10
        (20, 21), (21, 22), (22, 23),                    # chain
        (10, 30), (10, 31), (30, 31),                    # tri at hub
    ]
    got = _run(edges, ray_session)
    exp = triangle_stats_reference(edges)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    row = got[got.node == 1].iloc[0]
    assert row.triangles == 3 and row.clustering_coef == 1.0
    hub = got[got.node == 10].iloc[0]
    assert hub.triangles == 1 and hub.degree == 6


@pytest.mark.parametrize("seed,n,m", [(5, 40, 160), (6, 25, 80)])
def test_triangles_random_vs_reference(ray_session, seed, n, m):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    got = _run(sorted(edges), ray_session)
    exp = triangle_stats_reference(sorted(edges))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cooccurrence_edges_distinct_and_canonical(ray_session):
    import ray.data

    rows = []
    # group 1: items 3,1,2 (+ dup item 1) -> pairs (1,2),(1,3),(2,3)
    for it in (3, 1, 2, 1):
        rows.append({"g": 1, "i": it})
    # group 2: items 2,1 -> pair (1,2) again (must stay distinct)
    rows += [{"g": 2, "i": 2}, {"g": 2, "i": 1}]
    # group 3: singleton -> nothing
    rows.append({"g": 3, "i": 9})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    out = (
        cooccurrence_edges(ds, "g", "i", num_buckets=4)
        .to_pandas()[["a", "b"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [[1, 2], [1, 3], [2, 3]]


def _pagerank_reference(edge_pairs, damping=0.85, iters=10, dp=12):
    import numpy as np

    nodes = sorted({x for e in edge_pairs for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    adj = []
    deg = np.zeros(N)
    for a, b in edge_pairs:
        adj += [(idx[a], idx[b]), (idx[b], idx[a])]
    for s, _t in adj:
        deg[s] += 1
    r = np.full(N, round(1.0 / N, dp))
    for _ in range(iters):
        c = np.zeros(N)
        for s, t in adj:
            c[t] += r[s] / deg[s]
        r = np.round((1.0 - damping) / N + damping * c, dp)
    return {n: r[idx[n]] for n in nodes}


def test_pagerank_vs_reference(ray_session):
    import random

    rng = random.Random(31)
    edges = {(0, 1)}
    while len(edges) < 60:
        a, b = rng.randrange(30), rng.randrange(30)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    import ray.data
    from bern_ray.functions.graph import pagerank

    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["a", "b"])
    ).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    got = (
        pagerank(ds, num_buckets=4)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    exp = _pagerank_reference(edges)
    assert set(got) == set(exp)
    for n in exp:
        assert got[n] == exp[n], (n, got[n], exp[n])
    assert abs(sum(got.values()) - 1.0) < 1e-6  # stochastic, no dangling
    # hub of a star subgraph must outrank its leaves
    star = [(100, 101), (100, 102), (100, 103), (100, 104)]
    ds2 = ray.data.from_pandas(
        pd.DataFrame(star, columns=["a", "b"])
    ).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    got2 = (
        pagerank(ds2, num_buckets=2)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    assert got2[100] > got2[101] == got2[104]


def test_kcore_peels_tails(ray_session):
    import ray.data
    from bern_ray.functions.graph import kcore, kcore_reference

    # triangle (2-core) + pendant chain + a 4-clique (3-core) bridged
    # to the triangle by one edge; plus a long chain that needs
    # multiple peel rounds
    edges = [
        (1, 2), (2, 3), (1, 3),
        (3, 4), (4, 5), (5, 6), (6, 7),
        (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
        (3, 10),
    ]
    for k in (2, 3):
        ds = ray.data.from_pandas(
            pd.DataFrame(sorted(edges), columns=["a", "b"])
        ).map_batches(
            lambda t: t.replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        got = (
            kcore(ds, k=k, rounds=8, num_buckets=4)
            .to_pandas()
            .set_index("node")["core_degree"]
            .to_dict()
        )
        assert got == kcore_reference(edges, k=k, rounds=8)
    # k=3 keeps exactly the 4-clique
    assert set(kcore_reference(edges, k=3)) == {10, 11, 12, 13}


def test_kcore_random_vs_reference(ray_session):
    import random

    import ray.data
    from bern_ray.functions.graph import kcore, kcore_reference

    rng = random.Random(12)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    ds = ray.data.from_pandas(
        pd.DataFrame(sorted(edges), columns=["a", "b"])
    ).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    got = (
        kcore(ds, k=4, rounds=8, num_buckets=4)
        .to_pandas()
        .set_index("node")["core_degree"]
        .to_dict()
    )
    assert got == kcore_reference(sorted(edges), k=4, rounds=8)
