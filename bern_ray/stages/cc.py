"""Connected components over the scored edge list.

The transitive-clustering stage (north_rule): the distributed analog
of the reference's goid2goid canonical merge (normalize.py:89-95,
applied 591-592), generalized from a 1-hop map to true transitive
closure.

Two execution paths:

- ``union_find_streaming`` (default when the edge list fits the
  driver): stream edge batches with ``iter_batches`` into an in-memory
  union-find with path compression. Edges after thresholding are
  ~linear in mentions, so this holds far beyond test scale; it is the
  same shape as the reference's driver-side dict merge.
- ``label_propagation`` (scale path): iterative min-label propagation
  expressed entirely in Ray Data. The per-iteration join
  (labels ⋈ edges on node) is a PARTITIONED HASH JOIN built from
  primitives: both sides get a ``bucket = hash(node) % B`` column,
  one ``groupby(bucket)`` co-locates them, and a per-bucket pandas
  merge emits neighbor-label messages. Convergence uses the monotone
  invariant that min-labels only decrease: fixpoint <=> sum(labels)
  unchanged — no extra join needed. O(log diameter) iterations
  (cf. PAPERS.md BTS / large-star small-star).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def union_find_streaming(edges: "ray.data.Dataset") -> dict[int, int]:
    """Stream (src, dst) batches into union-find; returns node -> root.

    Consumes the Dataset as a stream (no full materialization on the
    driver beyond the node-id map itself).
    """
    parent: dict[int, int] = {}
    seen: set[int] = set()

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for s, d in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
            seen.add(s)
            seen.add(d)
            rs, rd = find(s), find(d)
            if rs != rd:
                # deterministic: smaller id wins as root
                if rs < rd:
                    parent[rd] = rs
                else:
                    parent[rs] = rd
    return {x: find(x) for x in seen}


_BUCKETS = 32


def _bucket_of(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    v = (
        col.combine_chunks()
        if isinstance(col, pa.ChunkedArray)
        else col
    ).to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return pa.array((h % _BUCKETS).astype(np.int64))


def _msgs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per bucket: join label rows (kind 'L') to edge rows (kind 'E')
    on node, emit (nbr, label) messages."""
    lab = g[g["kind"] == "L"]
    edg = g[g["kind"] == "E"]
    if lab.empty or edg.empty:
        return pa.table(
            {
                "node": pa.array([], type=pa.int64()),
                "cand": pa.array([], type=pa.int64()),
            }
        )
    merged = edg.merge(
        lab[["node", "val"]], on="node", suffixes=("", "_lab")
    )
    return pa.table(
        {
            "node": pa.array(
                merged["other"].to_numpy(dtype="int64"), type=pa.int64()
            ),
            "cand": pa.array(
                merged["val_lab"].to_numpy(dtype="int64"), type=pa.int64()
            ),
        }
    )


def label_propagation(
    edges: "ray.data.Dataset", max_iters: int = 50
) -> "ray.data.Dataset":
    """Distributed min-label propagation -> Dataset(node, label)."""

    def sym(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().cast(pa.int64())
        dst = t["dst"].combine_chunks().cast(pa.int64())
        node = pa.concat_arrays([src, dst])
        other = pa.concat_arrays([dst, src])
        return pa.table(
            {
                "bucket": _bucket_of(node),
                "node": node,
                "other": other,
                "val": pa.nulls(len(node), pa.int64()),
                "kind": pa.array(["E"] * len(node), type=pa.string()),
            }
        )

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    # initial labels: min neighbor per node (plus self)
    def init_lab(g: pd.DataFrame) -> pa.Table:
        m = g.groupby("node", as_index=False)["other"].min()
        lab = np.minimum(
            m["node"].to_numpy(dtype="int64"),
            m["other"].to_numpy(dtype="int64"),
        )
        return pa.table(
            {
                "node": pa.array(
                    m["node"].to_numpy(dtype="int64"), type=pa.int64()
                ),
                "label": pa.array(lab, type=pa.int64()),
            }
        )

    labels = (
        sym_edges.groupby("node")
        .map_groups(init_lab, batch_format="pandas")
        .materialize()
    )

    def lab_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": _bucket_of(t["node"]),
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "other": pa.nulls(t.num_rows, pa.int64()),
                "val": t["label"].combine_chunks().cast(pa.int64()),
                "kind": pa.array(["L"] * t.num_rows, type=pa.string()),
            }
        )

    def lab_msgs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "cand": t["label"].combine_chunks().cast(pa.int64()),
            }
        )

    def ptr_rows(t: pa.Table) -> pa.Table:
        """Pointer-jump request rows: for row (node, label), look up
        label[label] — encoded as an 'edge' keyed by the label."""
        lab = t["label"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "bucket": _bucket_of(lab),
                "node": lab,
                "other": t["node"].combine_chunks().cast(pa.int64()),
                "val": pa.nulls(t.num_rows, pa.int64()),
                "kind": pa.array(["E"] * t.num_rows, type=pa.string()),
            }
        )

    # groupby's hash shuffle emits one (often tiny) block per partition;
    # without coalescing, every union/map over labels schedules one task
    # per block and the per-iteration task count explodes. Repartition
    # down to a small fixed width after each materialize.
    _LABEL_BLOCKS = 16

    def _min_labels(cands: "ray.data.Dataset") -> "ray.data.Dataset":
        return (
            cands.groupby("node")
            .min("cand")
            .map_batches(
                lambda t: pa.table(
                    {"node": t["node"], "label": t["min(cand)"]}
                ),
                batch_format="pyarrow",
            )
            .repartition(_LABEL_BLOCKS)
            .materialize()
        )

    prev_sum = None
    for _ in range(max_iters):
        # (1) neighbor-min step
        tagged = sym_edges.union(
            labels.map_batches(lab_rows, batch_format="pyarrow")
        )
        msgs = tagged.groupby("bucket").map_groups(
            _msgs_in_bucket, batch_format="pandas"
        )
        labels = _min_labels(
            msgs.union(labels.map_batches(lab_msgs, batch_format="pyarrow"))
        )
        # (2) pointer jump: label <- label[label]; contracts chains so
        # convergence is O(log diameter) instead of O(diameter)
        jump_tagged = labels.map_batches(
            ptr_rows, batch_format="pyarrow"
        ).union(labels.map_batches(lab_rows, batch_format="pyarrow"))
        jump_msgs = jump_tagged.groupby("bucket").map_groups(
            _msgs_in_bucket, batch_format="pandas"
        )
        labels = _min_labels(
            jump_msgs.union(
                labels.map_batches(lab_msgs, batch_format="pyarrow")
            )
        )
        # monotone convergence: labels only decrease. labels is already
        # materialized, so summing its blocks reads refs without
        # triggering a new execution.
        cur = 0
        for b in labels.iter_batches(batch_format="pyarrow"):
            s = pa.compute.sum(b["label"]).as_py()
            cur += s if s is not None else 0
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    return labels


def _resolve_mode(
    edges: "ray.data.Dataset", mode: str, driver_limit: int
) -> str:
    """auto -> 'uf' when the edge count fits the driver budget, else
    'lp'. The count executes the (cheap, projection-only) edge stage
    once; at scale that is what makes the distributed path actually
    reachable rather than dead code."""
    if mode != "auto":
        return mode
    return "uf" if edges.count() <= driver_limit else "lp"


def components_labels(
    edges: "ray.data.Dataset",
    mode: str = "auto",
    driver_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """node -> component label as a Dataset(node, label) — the
    scale-facing API: in 'lp' mode labels NEVER leave the cluster; the
    caller attaches them with a bucketed join (stages/join.py), not a
    driver dict.
    """
    mode = _resolve_mode(edges, mode, driver_limit)
    if mode == "lp":
        return label_propagation(edges)
    lab = union_find_streaming(edges)
    n = len(lab)
    nodes = np.fromiter(lab.keys(), dtype=np.int64, count=n)
    roots = np.fromiter(lab.values(), dtype=np.int64, count=n)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "label": pa.array(roots, type=pa.int64()),
            }
        )
    )


def components(
    edges: "ray.data.Dataset",
    mode: str = "auto",
    driver_limit: int = 5_000_000,
) -> dict[int, int]:
    """node -> component root as a driver dict (test/debug API — the
    pipeline path is ``components_labels``)."""
    mode = _resolve_mode(edges, mode, driver_limit)
    if mode == "lp":
        out: dict[int, int] = {}
        for b in label_propagation(edges).iter_batches(
            batch_format="pyarrow"
        ):
            out.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
        return out
    return union_find_streaming(edges)
