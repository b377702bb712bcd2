"""Distributed graph analytics over co-occurrence / near-dup edges.

Triangle counting + local clustering coefficient is the standard
"is this blocking graph clique-like or chain-like?" diagnostic (a
near-dup cluster produced by transitive chaining has low coefficient;
a true duplicate class is a clique — the same distinction
`cluster_cohesion` draws from edge weights, here purely structural).
The algorithm is the classic degree-ordered wedge count (Schank &
Wagner 2005; Cohen's MapReduce formulation 2009; Suri & Vassilvitskii
WWW 2011 for the shuffle shape): orient every edge from its
lower-degree endpoint (ties by id), emit wedges only at each node's
out-neighborhood — Σ outdeg² is O(m·√m) worst case instead of the
Σ deg² a naive wedge count pays on a skewed graph — then one
distributed hash join of wedges against the edge set closes them.

Everything is the repo's standard shapes: per-batch partial counts
into one small groupby (degrees, per-node triangle counts),
`bucketed_apply` + `segments`/`segment_pairs` for the per-source
wedge fan-out, `bucket_join` for degree attach and the closure probe.
Nothing driver-sized: the only `take_all` in the flow is on K bucket
offsets inside helpers; edges, wedges and triangles stay Datasets.

No reference counterpart (dmis-lab/bern has no graph analytics); this
extends the near-dup/ER family the way SURVEY.md §2's "beyond the
reference" mandate describes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.blocking import segment_pairs
from ..stages.bucketed import bucketed_apply, segments
from ..stages.join import bucket_join

# item ids must fit 31 bits so a packed (a<<32)|b edge key stays a
# non-negative int64 (asserted in the kernels)
_PACK_SHIFT = np.int64(32)
_MAX_ID = np.int64(1) << np.int64(31)


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    assert a.size == 0 or (int(a.max()) < _MAX_ID and int(b.max()) < _MAX_ID)
    return (a.astype(np.int64) << _PACK_SHIFT) | b.astype(np.int64)


def cooccurrence_edges(
    ds: "ray.data.Dataset",
    group_col: str,
    item_col: str,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """DISTINCT undirected item pairs (a < b) sharing a group.

    One shuffle on hash(group) generates within-group pairs (items
    deduped per group first, so a group contributes each pair once);
    a second shuffle on the packed edge key makes pairs globally
    distinct — a key's rows co-locate, so per-bucket distinct is
    exact. Per-group pair emission is the vectorized
    `segment_pairs` triu kernel; items sort ascending inside the
    group, so emitted pairs are canonical a < b by construction.
    """

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, g))
        g, it = g[order], it[order]
        # dedupe identical (group, item) rows so a group emits each
        # unordered item pair exactly once
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (it[1:] != it[:-1])
        g, it = g[keep], it[keep]
        starts, sizes = segments(g)
        ai, bi = segment_pairs(starts, sizes, cap=None)
        return pa.table(
            {"a": pa.array(it[ai]), "b": pa.array(it[bi])}
        )

    pairs = bucketed_apply(
        ds.select_columns([group_col, item_col]),
        group_col,
        pairs_in_bucket,
        num_buckets=num_buckets,
    )

    def add_key(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return t.append_column("pk", pa.array(_pack(a, b)))

    def distinct_in_bucket(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False)
        _, first = np.unique(pk, return_index=True)
        return t.take(np.sort(first))

    return bucketed_apply(
        pairs.map_batches(add_key, batch_format="pyarrow"),
        "pk",
        distinct_in_bucket,
        num_buckets=num_buckets,
    )


def _degree_table(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(n, degree) via per-batch partial endpoint counts -> one
    groupby sum (degree table is node-sized and stays distributed)."""

    def partial(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                t["a"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False),
            ]
        )
        n, c = np.unique(both, return_counts=True)
        return pa.table(
            {
                "n": pa.array(n.astype(np.int64)),
                "partial": pa.array(c.astype(np.int64)),
            }
        )

    agg = edges.map_batches(partial, batch_format="pyarrow").groupby(
        "n"
    ).sum("partial")
    return agg.map_batches(
        lambda t: pa.table(
            {"n": t["n"], "degree": t["sum(partial)"]}
        ).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def triangle_stats(
    edges: "ray.data.Dataset",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-node (degree, triangle count, clustering coefficient) for a
    distinct undirected edge list (columns a, b with a < b).

    Stages: degree table -> two bucket_joins attach (deg_a, deg_b) ->
    degree-orientation (src = lower-degree endpoint, ties by id) ->
    per-src wedge fan-out (bucket-and-segment; out-neighbors sort
    ascending, so wedge (v, w) is canonical) -> closure probe: one
    bucket_join of wedges against the packed edge-key set -> per-node
    partial counts of the 3 corners -> groupby sum -> left-join back
    onto degrees. Nodes with degree < 2 (coefficient undefined) are
    dropped, matching the SQL oracle.
    """
    deg = _degree_table(edges)

    e_schema = {"a": pa.int64(), "b": pa.int64()}
    with_da = bucket_join(
        edges,
        deg.map_batches(
            lambda t: pa.table({"n": t["n"], "deg_a": t["degree"]}),
            batch_format="pyarrow",
        ),
        left_on="a",
        right_on="n",
        left_schema=e_schema,
        right_schema={"n": pa.int64(), "deg_a": pa.int64()},
        num_buckets=num_buckets,
    )
    with_db = bucket_join(
        with_da,
        deg.map_batches(
            lambda t: pa.table({"n": t["n"], "deg_b": t["degree"]}),
            batch_format="pyarrow",
        ),
        left_on="b",
        right_on="n",
        left_schema={**e_schema, "deg_a": pa.int64()},
        right_schema={"n": pa.int64(), "deg_b": pa.int64()},
        num_buckets=num_buckets,
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        # src = lower (degree, id) endpoint: the wedge owner
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
            }
        )

    oriented = with_db.map_batches(orient, batch_format="pyarrow")

    def wedges_in_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts, sizes = segments(src)
        ai, bi = segment_pairs(starts, sizes, cap=None)
        v, w = dst[ai], dst[bi]  # ascending within src => v < w
        return pa.table(
            {
                "u": pa.array(src[ai]),
                "wk": pa.array(_pack(v, w)),
            }
        )

    wedges = bucketed_apply(
        oriented, "src", wedges_in_bucket, num_buckets=num_buckets
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array(_pack(a, b))})

    closed = bucket_join(
        wedges,
        edges.map_batches(edge_keys, batch_format="pyarrow"),
        left_on="wk",
        right_on="pk",
        left_schema={"u": pa.int64(), "wk": pa.int64()},
        right_schema={"pk": pa.int64()},
        num_buckets=num_buckets,
    )

    def corner_partial(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        wk = t["wk"].to_numpy(zero_copy_only=False)
        v = (wk >> _PACK_SHIFT).astype(np.int64)
        w = (wk & np.int64(0xFFFFFFFF)).astype(np.int64)
        n, c = np.unique(np.concatenate([u, v, w]), return_counts=True)
        return pa.table(
            {
                "n": pa.array(n.astype(np.int64)),
                "partial": pa.array(c.astype(np.int64)),
            }
        )

    tcnt = (
        closed.map_batches(corner_partial, batch_format="pyarrow")
        .groupby("n")
        .sum("partial")
        .map_batches(
            lambda t: pa.table(
                {"n": t["n"], "triangles": t["sum(partial)"]}
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
    )

    joined = bucket_join(
        deg,
        tcnt.map_batches(
            lambda t: pa.table({"m": t["n"], "triangles": t["triangles"]}),
            batch_format="pyarrow",
        ),
        left_on="n",
        right_on="m",
        left_schema={"n": pa.int64(), "degree": pa.int64()},
        right_schema={"m": pa.int64(), "triangles": pa.int64()},
        how="left",
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False)
        tri = t["triangles"].to_numpy(zero_copy_only=False)
        tri = np.where(np.isnan(tri.astype(np.float64)), 0, tri).astype(
            np.int64
        )
        keep = d >= 2
        d, tri = d[keep], tri[keep]
        node = t["n"].to_numpy(zero_copy_only=False)[keep]
        coef = np.round(2.0 * tri / (d * (d - 1.0)), 6)
        return pa.table(
            {
                "node": pa.array(node.astype(np.int64)),
                "degree": pa.array(d.astype(np.int64)),
                "triangles": pa.array(tri),
                "clustering_coef": pa.array(coef),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def pagerank(
    edges: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 10,
    round_dp: int = 12,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Fixed-iteration PageRank over an undirected edge list (a, b)
    — each edge walks both ways; every node has degree >= 1, so there
    are no dangling nodes to redistribute.

    Iterative driver loop, distributed data: per iteration one
    bucket_join ships the node-sized rank table onto the edge
    partitions (never the reverse), per-batch partial sums of
    r/deg by destination fold into one node groupby, and a left
    bucket_join back onto the node set applies
    r' = (1-d)/N + d * contrib. Ranks are MATERIALIZED per iteration
    (node-sized) — a lazy chain would re-execute every prior
    iteration per consumer.

    Float determinism: both this and the recursive-CTE oracle round
    every iteration's rank to `round_dp` decimals, so partial-sum
    ORDER (nondeterministic on both sides) cannot accumulate drift —
    per-sum error is ~1e-15 and the shared 1e-12 grid absorbs it;
    the query output rounds to 6 for the value hash.
    """

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(np.concatenate([a, b]).astype(np.int64)),
                "t": pa.array(np.concatenate([b, a]).astype(np.int64)),
            }
        )

    dirs = edges.map_batches(both_dirs, batch_format="pyarrow")

    def deg_partial(t: pa.Table) -> pa.Table:
        n, c = np.unique(
            t["s"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "n": pa.array(n.astype(np.int64)),
                "partial": pa.array(c.astype(np.int64)),
            }
        )

    deg = (
        dirs.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("n")
        .sum("partial")
        .map_batches(
            lambda t: pa.table(
                {"dn": t["n"], "d": t["sum(partial)"]}
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_nodes = deg.count()
    base = round((1.0 - damping) / n_nodes, 20)

    dir_deg = bucket_join(
        dirs,
        deg,
        left_on="s",
        right_on="dn",
        left_schema={"s": pa.int64(), "t": pa.int64()},
        right_schema={"dn": pa.int64(), "d": pa.int64()},
        num_buckets=num_buckets,
    ).materialize()

    r0 = round(1.0 / n_nodes, round_dp)
    ranks = deg.map_batches(
        lambda t: pa.table(
            {
                "rn": t["dn"],
                "r": pa.array(
                    np.full(t.num_rows, r0, dtype=np.float64)
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        withr = bucket_join(
            dir_deg,
            ranks,
            left_on="s",
            right_on="rn",
            left_schema={"s": pa.int64(), "t": pa.int64(), "d": pa.int64()},
            right_schema={"rn": pa.int64(), "r": pa.float64()},
            num_buckets=num_buckets,
        )

        def contrib_partial(t: pa.Table) -> pa.Table:
            dst = t["t"].to_numpy(zero_copy_only=False)
            w = t["r"].to_numpy(zero_copy_only=False) / t["d"].to_numpy(
                zero_copy_only=False
            )
            u, inv = np.unique(dst, return_inverse=True)
            s = np.zeros(len(u), dtype=np.float64)
            np.add.at(s, inv, w)
            return pa.table(
                {
                    "cn": pa.array(u.astype(np.int64)),
                    "partial": pa.array(s),
                }
            )

        contrib = (
            withr.map_batches(contrib_partial, batch_format="pyarrow")
            .groupby("cn")
            .sum("partial")
            .map_batches(
                lambda t: pa.table(
                    {"cn": t["cn"], "c": t["sum(partial)"]}
                ).replace_schema_metadata(None),
                batch_format="pyarrow",
            )
        )

        stepped = bucket_join(
            deg.map_batches(
                lambda t: pa.table({"rn": t["dn"]}), batch_format="pyarrow"
            ),
            contrib,
            left_on="rn",
            right_on="cn",
            left_schema={"rn": pa.int64()},
            right_schema={"cn": pa.int64(), "c": pa.float64()},
            how="left",
            num_buckets=num_buckets,
        )

        def apply_step(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            c = np.where(np.isnan(c), 0.0, c)
            r = np.round(base + damping * c, round_dp)
            return pa.table({"rn": t["rn"], "r": pa.array(r)})

        ranks = stepped.map_batches(
            apply_step, batch_format="pyarrow"
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t["rn"], "rank": t["r"]}),
        batch_format="pyarrow",
    )


def kcore(
    edges: "ray.data.Dataset",
    k: int = 2,
    rounds: int = 8,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """k-core of an undirected edge list by FIXED-round peeling:
    each round drops every edge touching a node whose current degree
    is < k (Matula-Beck peeling, synchronous variant — the standard
    distributed formulation, one degree groupby + two semi-join
    filters per round). `rounds` is part of the operator's contract,
    shared verbatim with the recursive-CTE oracle, so both sides
    agree even on graphs whose peeling hasn't converged yet; peeling
    removes >= 1 node per non-converged round, so rounds >= the
    longest dependency chain converges (8 covers every test graph
    and the co-purchase corpus; production would raise it or loop to
    fixed point via the surviving-edge count).

    Returns (node, core_degree) for nodes surviving all rounds. The
    directed representation (each edge both ways) makes the
    endpoint filter symmetric: one groupby on the source column IS
    the degree table.
    """

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(np.concatenate([a, b]).astype(np.int64)),
                "t": pa.array(np.concatenate([b, a]).astype(np.int64)),
            }
        )

    def deg_partial(t: pa.Table) -> pa.Table:
        n, c = np.unique(
            t["s"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "n": pa.array(n.astype(np.int64)),
                "partial": pa.array(c.astype(np.int64)),
            }
        )

    def degrees(dirs: "ray.data.Dataset") -> "ray.data.Dataset":
        return (
            dirs.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("n")
            .sum("partial")
            .map_batches(
                lambda t: pa.table(
                    {"n": t["n"], "d": t["sum(partial)"]}
                ).replace_schema_metadata(None),
                batch_format="pyarrow",
            )
        )

    surv = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    for _ in range(rounds):
        keep = degrees(surv).map_batches(
            lambda t: t.filter(pc.greater_equal(t["d"], k)).select(["n"]),
            batch_format="pyarrow",
        ).materialize()
        fs = bucket_join(
            surv,
            keep.map_batches(
                lambda t: t.rename_columns(["kn"]), batch_format="pyarrow"
            ),
            left_on="s",
            right_on="kn",
            left_schema={"s": pa.int64(), "t": pa.int64()},
            right_schema={"kn": pa.int64()},
            num_buckets=num_buckets,
        )
        surv = bucket_join(
            fs,
            keep.map_batches(
                lambda t: t.rename_columns(["kt"]), batch_format="pyarrow"
            ),
            left_on="t",
            right_on="kt",
            left_schema={"s": pa.int64(), "t": pa.int64()},
            right_schema={"kt": pa.int64()},
            num_buckets=num_buckets,
        ).materialize()

    return degrees(surv).map_batches(
        lambda t: pa.table({"node": t["n"], "core_degree": t["d"]}),
        batch_format="pyarrow",
    )


def kcore_reference(edge_pairs, k=2, rounds=8):
    """Scalar synchronous peeling for tests."""
    edges = set(edge_pairs)
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        edges = {
            (a, b) for a, b in edges if deg[a] >= k and deg[b] >= k
        }
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return dict(sorted(deg.items()))


def triangle_stats_reference(
    edge_pairs: list[tuple[int, int]],
) -> pd.DataFrame:
    """Brute-force per-node triangle counts + coefficients for tests:
    adjacency sets, every triple checked once via sorted neighbor
    intersection."""
    adj: dict[int, set[int]] = {}
    for a, b in set(edge_pairs):
        assert a < b
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    nodes = sorted(adj)
    for a in nodes:
        for b in sorted(adj[a]):
            if b <= a:
                continue
            common = adj[a] & adj[b]
            for c in common:
                if c > b:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    rows = []
    for n in nodes:
        d = len(adj[n])
        if d < 2:
            continue
        rows.append(
            {
                "node": n,
                "degree": d,
                "triangles": tri[n],
                "clustering_coef": round(2.0 * tri[n] / (d * (d - 1)), 6),
            }
        )
    return pd.DataFrame(rows).sort_values("node").reset_index(drop=True)


LPA_PACK = 1 << 33


def label_propagation(
    edges: "ray.data.Dataset",
    rounds: int = 4,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Synchronous label-propagation communities (Raghavan et al.
    2007) over an undirected (a, b) edge list, made DETERMINISTIC so
    a recursive-CTE oracle can agree value-for-value: every node
    starts labeled with itself; each round it adopts the most
    frequent label among its neighbors, ties broken toward the
    SMALLEST label; `rounds` is part of the contract (LPA oscillates
    on bipartite structure — a fixed round count pins the output on
    both sides instead of chasing convergence).

    The (count desc, label asc) argmax is ONE packed max:
    count * 2^33 + (2^33 - 1 - label) — labels are node ids < 2^33 —
    so each round is two shuffles: a bucket_join shipping labels onto
    edge sources, then a hash(t) bucket that counts (t, label) pairs
    and takes the packed max per node in-bucket. No driver-side
    state; round cost is O(E) shipped both shuffles.

    Returns (node, community) after `rounds` rounds.
    """
    from ..stages.join import bucket_join

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(np.concatenate([a, b]).astype(np.int64)),
                "t": pa.array(np.concatenate([b, a]).astype(np.int64)),
            }
        )

    dirs = edges.map_batches(
        both_dirs, batch_format="pyarrow"
    ).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        n = np.unique(t["s"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "n": pa.array(n.astype(np.int64)),
                "lbl": pa.array(n.astype(np.int64)),
            }
        )

    # per-bucket unique is globally unique: bucketed on s, a node's
    # rows co-locate
    labels = bucketed_apply(
        dirs, "s", init_labels, num_buckets=num_buckets
    ).materialize()

    def mode_bucket(t: pa.Table) -> pa.Table:
        tt = t["t"].to_numpy(zero_copy_only=False)
        ll = t["lbl"].to_numpy(zero_copy_only=False)
        df = (
            pd.DataFrame({"t": tt, "lbl": ll})
            .groupby(["t", "lbl"], as_index=False)
            .size()
        )
        pack = (
            df["size"].to_numpy().astype(np.int64) * LPA_PACK
            + (LPA_PACK - 1 - df["lbl"].to_numpy())
        )
        df["pack"] = pack
        best = df.groupby("t", as_index=False)["pack"].max()
        return pa.table(
            {
                "n": pa.array(
                    best["t"].to_numpy().astype(np.int64)
                ),
                "lbl": pa.array(
                    (LPA_PACK - 1)
                    - best["pack"].to_numpy() % LPA_PACK
                ),
            }
        )

    for _ in range(rounds):
        contrib = bucket_join(
            dirs,
            labels,
            left_on="s",
            right_on="n",
            left_schema={"s": pa.int64(), "t": pa.int64()},
            right_schema={"n": pa.int64(), "lbl": pa.int64()},
        )
        labels = bucketed_apply(
            contrib.map_batches(
                lambda t: t.select(["t", "lbl"]),
                batch_format="pyarrow",
            ),
            "t",
            mode_bucket,
            num_buckets=num_buckets,
        ).materialize()

    return labels.map_batches(
        lambda t: pa.table(
            {"node": t["n"], "community": t["lbl"]}
        ),
        batch_format="pyarrow",
    )


def label_propagation_reference(edge_pairs, rounds=4):
    """Scalar synchronous LPA for tests (min-label tie-break)."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for a, b in edge_pairs:
        adj[a].append(b)
        adj[b].append(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(lbl[m] for m in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lbl = new
    return dict(sorted(lbl.items()))


def item_cosine_similarity(
    ds: "ray.data.Dataset",
    group_col: str,
    item_col: str,
    threshold: float = 0.25,
    min_support: int = 3,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Item-item cosine similarity from the bipartite (group, item)
    incidence — the collaborative-filtering projection (Sarwar et al.
    WWW 2001): sim(a, b) = co(a, b) / sqrt(deg(a) * deg(b)) with
    co = #groups containing both items, deg = #groups containing the
    item; emitted for pairs with co >= min_support AND sim >=
    threshold. The support floor doubles as the skew guard — hot
    items pair only when they co-occur repeatedly.

    Shape: per-group pair fan-out + co counts are one hash(group)
    shuffle then one packed-edge-key groupby (the cooccurrence_edges
    shape plus counts); degrees are per-batch partials into a tiny
    groupby; two bucket_joins attach both endpoints' degrees. The
    cosine expression mirrors the SQL oracle token-for-token."""

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, g))
        g, it = g[order], it[order]
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (it[1:] != it[:-1])
        g, it = g[keep], it[keep]
        starts, sizes = segments(g)
        ai, bi = segment_pairs(starts, sizes, cap=None)
        pk = _pack(it[ai], it[bi])
        u, c = np.unique(pk, return_counts=True)
        # degree partials ride the SAME shuffle: distinct-group item
        # counts keyed as -(item+1), disjoint from packed pairs (>= 0)
        iu, ic = np.unique(it, return_counts=True)
        return pa.table(
            {
                "pk": pa.array(np.concatenate([u, -iu - 1])),
                "partial": pa.array(
                    np.concatenate([c, ic]).astype(np.int64)
                ),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        k = t["pk"].to_numpy(zero_copy_only=False)
        p = t["partial"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="mergesort")
        k, p = k[order], p[order]
        starts, _sizes = segments(k)
        return pa.table(
            {
                "pk": pa.array(k[starts]),
                "n": pa.array(np.add.reduceat(p, starts)),
            }
        )

    # TWO hash shuffles total (group fan-out, then pk combine) — the
    # in-bucket reduceat combine replaces ray.data's sort-based
    # groupby, which measured ~10x slower on the 1.2M-key pair table
    combined = bucketed_apply(
        bucketed_apply(
            ds.select_columns([group_col, item_col]),
            group_col,
            pairs_in_bucket,
            num_buckets=num_buckets,
        ),
        "pk",
        combine,
        num_buckets=num_buckets,
    ).materialize()

    def unpack(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False)
        c = t["n"].to_numpy(zero_copy_only=False)
        keep = (pk >= 0) & (c >= min_support)
        pk, c = pk[keep], c[keep]
        return pa.table(
            {
                "a": pa.array(pk >> _PACK_SHIFT),
                "b": pa.array(pk & ((np.int64(1) << _PACK_SHIFT) - 1)),
                "co": pa.array(c.astype(np.int64)),
            }
        )

    co = combined.map_batches(unpack, batch_format="pyarrow")

    def deg_rows(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False)
        c = t["n"].to_numpy(zero_copy_only=False)
        keep = pk < 0
        return pa.table(
            {
                "i": pa.array(-pk[keep] - 1),
                "d": pa.array(c[keep].astype(np.int64)),
            }
        )

    deg = combined.map_batches(deg_rows, batch_format="pyarrow")

    j1 = bucket_join(
        co,
        deg,
        left_on="a",
        right_on="i",
        left_schema={
            "a": pa.int64(),
            "b": pa.int64(),
            "co": pa.int64(),
        },
        right_schema={"i": pa.int64(), "d": pa.int64()},
    ).map_batches(
        lambda t: t.rename_columns(["a", "b", "co", "da"]),
        batch_format="pyarrow",
    )
    j2 = bucket_join(
        j1,
        deg,
        left_on="b",
        right_on="i",
        left_schema={
            "a": pa.int64(),
            "b": pa.int64(),
            "co": pa.int64(),
            "da": pa.int64(),
        },
        right_schema={"i": pa.int64(), "d": pa.int64()},
    ).map_batches(
        lambda t: t.rename_columns(["a", "b", "co", "da", "db"]),
        batch_format="pyarrow",
    )

    def score(t: pa.Table) -> pa.Table:
        co_ = t["co"].to_numpy(zero_copy_only=False).astype(float)
        da = t["da"].to_numpy(zero_copy_only=False).astype(float)
        db = t["db"].to_numpy(zero_copy_only=False).astype(float)
        s = co_ / np.sqrt(da * db)
        keep = s >= threshold
        return pa.table(
            {
                "item_a": pa.array(
                    t["a"].to_numpy(zero_copy_only=False)[keep]
                ),
                "item_b": pa.array(
                    t["b"].to_numpy(zero_copy_only=False)[keep]
                ),
                "co_groups": pa.array(
                    t["co"].to_numpy(zero_copy_only=False)[keep]
                ),
                "cosine": pa.array(np.round(s[keep], 6)),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")
