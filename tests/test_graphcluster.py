"""CENTER / MERGE-CENTER / STAR: planted-graph pins and structural
invariants (the deterministic specs in functions/graphcluster.py)."""

import numpy as np
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def _edges(rows):
    return ray.data.from_items(
        [
            {"doc_id_a": a, "doc_id_b": b, "score": float(s)}
            for a, b, s in rows
        ]
    )


def _run(rows, algorithm):
    from bern_ray.functions.graphcluster import cluster_edges

    df = (
        cluster_edges(_edges(rows), algorithm=algorithm)
        .to_pandas()
        .sort_values(["node_id", "cluster_id"])
        .reset_index(drop=True)
    )
    return df


def test_center_cuts_chain(ray_session):
    """Path 1-2-3 with the strong edge first: CENTER seats 1 as the
    hub, 2 joins 1; edge (2,3) connects a NON-center to an unassigned
    node, so 3 stays out and becomes a singleton... which CENTER
    leaves unassigned — 3 never appears (no center reached it). CC
    would weld all three."""
    out = _run([(1, 2, 0.9), (2, 3, 0.8)], "center")
    got = dict(zip(out.node_id, out.cluster_id))
    assert got == {1: 1, 2: 1}
    centers = set(out[out.is_center].node_id)
    assert centers == {1}


def test_merge_center_grows_through_members(ray_session):
    """Same chain under MERGE-CENTER: 3 joins through the member
    contact (2), landing in cluster 1."""
    out = _run([(1, 2, 0.9), (2, 3, 0.8)], "merge_center")
    got = dict(zip(out.node_id, out.cluster_id))
    assert got == {1: 1, 2: 1, 3: 1}


def test_merge_center_merges_on_center_contact(ray_session):
    """Two clusters form first (1,2) and (3,4); then an edge from
    member 2 to CENTER 3 merges them; min-member relabel gives one
    cluster labeled 1."""
    rows = [(1, 2, 0.95), (3, 4, 0.9), (2, 3, 0.5)]
    out = _run(rows, "merge_center")
    got = dict(zip(out.node_id, out.cluster_id))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
    # CENTER on the same graph keeps them apart (2 is not a center)
    out_c = _run(rows, "center")
    got_c = dict(zip(out_c.node_id, out_c.cluster_id))
    assert got_c == {1: 1, 2: 1, 3: 3, 4: 3}


def test_star_hubs_by_degree(ray_session):
    """Star graph 0-{1,2,3} plus pendant 3-4: node 0 (degree 3) hubs
    first covering 1,2,3; node 4 remains and hubs itself, pulling in
    its (covered) neighbor 3 — overlap is allowed by the original
    STAR semantics."""
    rows = [(0, 1, 0.9), (0, 2, 0.9), (0, 3, 0.9), (3, 4, 0.9)]
    out = _run(rows, "star")
    stars = {
        c: set(g.node_id)
        for c, g in out.groupby("cluster_id")
    }
    assert stars[0] == {0, 1, 2, 3}
    assert stars[4] == {4, 3}
    hubs = set(out[out.is_center].node_id)
    assert hubs == {0, 4}


def test_components_isolated(ray_session):
    """Two disjoint components cluster independently and labels never
    cross (the per-component map_groups contract)."""
    rows = [(1, 2, 0.9), (10, 11, 0.8), (11, 12, 0.7)]
    for alg in ("center", "merge_center", "star"):
        out = _run(rows, alg)
        lo = out[out.node_id < 10]
        hi = out[out.node_id >= 10]
        assert set(lo.cluster_id) <= {1, 2}
        assert set(hi.cluster_id) <= {10, 11, 12}


def test_real_edges_all_algorithms(ray_session):
    """On the sf0.001 near-dup graph: every clustered node's cluster
    root is a center; center/merge-center assign each node once;
    merge-center clusters are a coarsening of center's; star covers
    every node of the edge set."""
    from bern_ray.pipelines.relational import q_graph_clusters

    out = q_graph_clusters(SF).to_pandas()
    assert set(out.algorithm) == {"center", "merge_center", "star", "pivot"}
    cen = out[out.algorithm == "center"]
    mc = out[out.algorithm == "merge_center"]
    star = out[out.algorithm == "star"]
    piv = out[out.algorithm == "pivot"]
    assert not cen.node_id.duplicated().any()
    assert not mc.node_id.duplicated().any()
    # pivot is a strict partition of the edge-set nodes
    assert not piv.node_id.duplicated().any()
    assert set(piv.node_id) == set(star.node_id)
    # every cluster id is one of its own members and a center
    for df in (cen, mc):
        roots = set(df.cluster_id)
        assert roots <= set(df.node_id)
        centers = set(df[df.is_center].node_id)
        assert roots <= centers
    # merge-center never splits a center cluster
    cmap = dict(zip(cen.node_id, cen.cluster_id))
    mmap = dict(zip(mc.node_id, mc.cluster_id))
    for a in cmap:
        for b in cmap:
            if cmap[a] == cmap[b]:
                assert mmap.get(a) == mmap.get(b)
    # star covers everything that has an edge
    assert set(star.node_id) >= set(cen.node_id)


def test_pivot_partition(ray_session):
    """PIVOT on the path 1-2-3: pivot 1 claims 2; 3 pivots itself —
    a strict partition, coarser than CENTER's reach but never
    overlapping like STAR."""
    out = _run([(1, 2, 0.9), (2, 3, 0.8)], "pivot")
    got = dict(zip(out.node_id, out.cluster_id))
    assert got == {1: 1, 2: 1, 3: 3}
    assert not out.node_id.duplicated().any()
    assert set(out[out.is_center].node_id) == {1, 3}


def test_pivot_triangle_plus_pendant(ray_session):
    """Triangle {1,2,3} + pendant 3-4: pivot 1 claims 2 and 3;
    4 pivots itself."""
    rows = [(1, 2, 0.9), (1, 3, 0.9), (2, 3, 0.9), (3, 4, 0.9)]
    out = _run(rows, "pivot")
    got = dict(zip(out.node_id, out.cluster_id))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}
