"""ER graph-clustering algorithms beyond connected components.

Connected components (stages/cc.py) is the transitive-closure
baseline, but it chains false positives: one bad edge welds two real
entities. The standard ER literature (Hassanzadeh, Chiang, Lee &
Miller, VLDB 2009 — "Framework for evaluating clustering algorithms
in duplicate detection"; Aslam, Pelekhov & Rus 2004 for STAR) uses
center-based algorithms that cut chains at cluster centers:

- CENTER: scan edges by descending score; the first unassigned
  endpoint of a fresh edge becomes a cluster CENTER, nodes join only
  through an edge to a center.
- MERGE-CENTER: CENTER, plus two clusters merge whenever an edge
  connects a node of one cluster to the CENTER of another.
- STAR: nodes by descending degree become star centers; every
  threshold-neighbor joins the star (overlapping clusters, the
  original Aslam et al. semantics — is_center marks the hub).
- PIVOT: KwikCluster correlation clustering (Ailon, Charikar &
  Newman 2008), ascending-id permutation — an unclustered node
  becomes a pivot and claims its unclustered positive neighbors; a
  3-approximation in expectation under a random permutation, here
  pinned to the deterministic id order.
- COMPLETE_LINK / AVERAGE_LINK: agglomerative clustering over the
  scored edges (the Dedupe.io clustering step) — merge the
  highest-linkage cluster pair until the best linkage drops below
  the threshold. Complete linkage (min cross score, missing pair =
  -inf) is the strongest chain cutter; average linkage (mean cross
  score, missing pairs count 0) is UPGMA on the sparse graph. Sparse
  Lance-Williams: per-pair (min, sum, count) stats fold additively,
  so memory stays O(edges), never O(nodes^2).

Distribution: these greedies are order-sequential GLOBALLY but
component-local — an edge never crosses connected components, so the
engine runs connected components first (the distributed CC stage),
attaches the component label to every edge with one bucketed hash
join, and runs the exact sequential algorithm independently per
component via groupby(component).map_groups. Partitioning
assumption: one COMPONENT's edge set fits a worker — guaranteed
upstream by blocking's per-block pair caps; an oversized component
(> COMPONENT_EDGE_WARN edges) is reported through the counters
sidecar rather than silently stalling a worker.

Determinism: edges sort by (-score, a, b), nodes by (-degree, id),
cluster labels are CENTER ids (a merge keeps the min center id) —
every output is a pure function of the edge set, which is what the
pytest pins rely on (tests/test_graphcluster.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

COMPONENT_EDGE_WARN = 2_000_000


def _center_assign(
    a: np.ndarray, b: np.ndarray, merge: bool
) -> tuple[dict, set]:
    """CENTER / MERGE-CENTER over edges already sorted by descending
    score (ties: ascending a, b). Returns (node -> cluster root,
    centers). Cluster roots are tracked with a tiny union-find so
    MERGE-CENTER's merges stay near-linear."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    assign: dict[int, int] = {}
    centers: set[int] = set()
    for u, v in zip(a.tolist(), b.tolist()):
        cu, cv = assign.get(u), assign.get(v)
        if cu is None and cv is None:
            parent[u] = u
            assign[u] = u
            centers.add(u)
            assign[v] = u
        elif cv is None:
            if u in centers:
                assign[v] = find(assign[u])
            elif merge:
                # MC also grows a cluster through non-center contact
                assign[v] = find(assign[u])
        elif cu is None:
            if v in centers:
                assign[u] = find(assign[v])
            elif merge:
                assign[u] = find(assign[v])
        elif merge:
            ru, rv = find(assign[u]), find(assign[v])
            if ru != rv and (u in centers or v in centers):
                # deterministic union: min root wins
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
    return {n: find(c) for n, c in assign.items()}, centers


def _star_rows(
    a: np.ndarray, b: np.ndarray
) -> tuple[list[int], list[int], list[bool]]:
    """Original overlapping STAR: highest-degree unassigned node (tie:
    min id) becomes a hub; ALL its neighbors join the star (covered,
    but may also appear in later stars only while still uncovered —
    we emit each node once per star membership at hub-selection
    time)."""
    nodes = np.unique(np.concatenate([a, b]))
    nbrs: dict[int, set] = {int(n): set() for n in nodes}
    for u, v in zip(a.tolist(), b.tolist()):
        nbrs[u].add(v)
        nbrs[v].add(u)
    order = sorted(nodes.tolist(), key=lambda n: (-len(nbrs[n]), n))
    covered: set[int] = set()
    out_n: list[int] = []
    out_c: list[int] = []
    out_h: list[bool] = []
    for n in order:
        if n in covered:
            continue
        covered.add(n)
        out_n.append(n)
        out_c.append(n)
        out_h.append(True)
        for m in sorted(nbrs[n]):
            out_n.append(m)
            out_c.append(n)
            out_h.append(False)
            covered.add(m)
    return out_n, out_c, out_h


def _pivot_rows(
    a: np.ndarray, b: np.ndarray
) -> tuple[list[int], list[int], list[bool]]:
    """PIVOT / KwikCluster correlation clustering (Ailon, Charikar &
    Newman 2008) with the deterministic ascending-id permutation:
    scan nodes in id order; an unclustered node becomes a pivot and
    claims every still-unclustered positive neighbor. Every node is
    clustered exactly once (a partition, unlike STAR)."""
    nodes = np.unique(np.concatenate([a, b]))
    nbrs: dict[int, set] = {int(n): set() for n in nodes}
    for u, v in zip(a.tolist(), b.tolist()):
        nbrs[u].add(v)
        nbrs[v].add(u)
    clustered: set[int] = set()
    out_n: list[int] = []
    out_c: list[int] = []
    out_h: list[bool] = []
    for n in nodes.tolist():
        if n in clustered:
            continue
        clustered.add(n)
        out_n.append(n)
        out_c.append(n)
        out_h.append(True)
        for m in sorted(nbrs[n]):
            if m not in clustered:
                clustered.add(m)
                out_n.append(m)
                out_c.append(n)
                out_h.append(False)
    return out_n, out_c, out_h


def _hac_rows(
    a: np.ndarray,
    b: np.ndarray,
    s: np.ndarray,
    threshold: float,
    linkage: str,
) -> tuple[list, list, list]:
    """Agglomerative clustering over one component's scored edges —
    the Dedupe.io-style alternative to the greedy center family:

    - ``complete`` linkage: two clusters merge only if EVERY cross
      pair is a scored edge with score >= threshold (a missing pair
      is similarity -inf), i.e. min-linkage — immune to the chaining
      that welds entities through one bridge record.
    - ``average`` linkage: mean cross-pair score with missing pairs
      counting 0 must reach threshold (UPGMA on the sparse graph).

    Sparse Lance-Williams: per cluster-pair (min, sum, count) stats
    fold additively on merge, so only pairs sharing at least one edge
    are ever tracked. Deterministic: each round merges the
    highest-linkage pair, ties to the smallest (root_a, root_b);
    roots are min node ids, so labels are min member ids. Exact —
    output is a pure function of the edge set (pytest-pinned against
    a dense-matrix reference)."""
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    size = {n: 1 for n in nodes}
    members = {n: [n] for n in nodes}
    stats: dict[tuple, list] = {}
    for x, y, sc in zip(a.tolist(), b.tolist(), s.tolist()):
        if x == y:
            continue
        k = (x, y) if x < y else (y, x)
        st = stats.get(k)
        if st is None:
            stats[k] = [sc, sc, 1]
        else:  # parallel edges fold conservatively (min / sum)
            st[0] = min(st[0], sc)
            st[1] += sc
            st[2] += 1

    def linkval(k: tuple) -> float:
        ra, rb = k
        st = stats[k]
        if linkage == "complete":
            if st[2] != size[ra] * size[rb]:
                return float("-inf")
            return st[0]
        return st[1] / (size[ra] * size[rb])

    while stats:
        best_k = None
        best_v = None
        for k in stats:
            v = linkval(k)
            if v < threshold:
                continue
            if best_v is None or v > best_v or (v == best_v and k < best_k):
                best_k, best_v = k, v
        if best_k is None:
            break
        ra, rb = best_k  # ra < rb; merged root stays ra (min id)
        del stats[best_k]
        touching = [k for k in stats if rb in k]
        for k in touching:
            st = stats.pop(k)
            other = k[0] if k[1] == rb else k[1]
            kk = (ra, other) if ra < other else (other, ra)
            ex = stats.get(kk)
            if ex is None:
                stats[kk] = st
            else:
                ex[0] = min(ex[0], st[0])
                ex[1] += st[1]
                ex[2] += st[2]
        size[ra] += size.pop(rb)
        members[ra].extend(members.pop(rb))

    out_n: list = []
    out_c: list = []
    out_h: list = []
    for root, mem in members.items():
        for n in mem:
            out_n.append(n)
            out_c.append(root)
            out_h.append(n == root)
    return out_n, out_c, out_h


def _cluster_component(algorithm: str, threshold: float | None = None):
    """map_groups kernel: one component's edges -> (node_id,
    cluster_id, is_center) under `algorithm`."""

    def fn(g: pd.DataFrame) -> pa.Table:
        if len(g) > COMPONENT_EDGE_WARN:
            from ..state.counters import add_many

            add_many(
                {
                    "graphcluster_oversized_components": 1,
                    "graphcluster_oversized_edges": int(len(g)),
                }
            )
        g = g.sort_values(
            ["score", "doc_id_a", "doc_id_b"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        a = g["doc_id_a"].to_numpy(dtype=np.int64)
        b = g["doc_id_b"].to_numpy(dtype=np.int64)
        if algorithm == "star":
            n, c, h = _star_rows(a, b)
        elif algorithm == "pivot":
            n, c, h = _pivot_rows(a, b)
        elif algorithm in ("complete_link", "average_link"):
            n, c, h = _hac_rows(
                a,
                b,
                g["score"].to_numpy(dtype=np.float64),
                threshold,
                algorithm.split("_", 1)[0],
            )
        else:
            assign, centers = _center_assign(
                a, b, merge=(algorithm == "merge_center")
            )
            # cluster labels ARE center ids: initial roots are centers
            # and MC's min-root union keeps the merged root a center
            n = list(assign)
            c = [assign[x] for x in n]
            h = [x in centers for x in n]
        return pa.table(
            {
                "node_id": pa.array(n, type=pa.int64()),
                "cluster_id": pa.array(c, type=pa.int64()),
                "is_center": pa.array(h, type=pa.bool_()),
            }
        )

    return fn


def cluster_edges(
    edges: "ray.data.Dataset",
    algorithm: str = "center",
    threshold: float | None = None,
) -> "ray.data.Dataset":
    """(doc_id_a, doc_id_b, score) -> (node_id, cluster_id,
    is_center) under CENTER / MERGE-CENTER / STAR / PIVOT /
    COMPLETE_LINK / AVERAGE_LINK. Distributed CC attaches a component
    id to every edge (one bucketed hash join on doc_id_a — both
    endpoints share the component by construction), then each
    component runs the exact sequential algorithm independently
    (module docstring). The HAC linkages additionally take the merge
    ``threshold`` (the agglomeration stop score — required)."""
    if algorithm not in (
        "center",
        "merge_center",
        "star",
        "pivot",
        "complete_link",
        "average_link",
    ):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm.endswith("_link") and threshold is None:
        raise ValueError(f"{algorithm} requires threshold=")
    from ..stages.cc import components_labels
    from ..stages.join import bucket_join

    e = edges.materialize()
    labels = components_labels(
        e.map_batches(
            lambda t: pa.table(
                {"src": t["doc_id_a"], "dst": t["doc_id_b"]}
            ),
            batch_format="pyarrow",
        )
    )
    tagged = bucket_join(
        e,
        labels,
        left_on="doc_id_a",
        right_on="node",
        left_schema={
            "doc_id_a": pa.int64(),
            "doc_id_b": pa.int64(),
            "score": pa.float64(),
        },
        right_schema={"node": pa.int64(), "label": pa.int64()},
        how="inner",
    )
    return tagged.groupby("label").map_groups(
        _cluster_component(algorithm, threshold), batch_format="pandas"
    )
