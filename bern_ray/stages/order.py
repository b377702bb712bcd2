"""Global order operators: exact distributed row_number and
sorted-neighborhood blocking.

Ray Data has no native row_number; sorting alone gives ordered blocks
but no task knows its global offset. `global_rank` supplies it with
the classic range-partition shape, no driver-side row materialization:

1. sample the (int64, caller-unique) order key per block -> ~B*32
   values on the driver -> B-1 range boundaries;
2. per-batch partial counts per range bucket -> tiny groupby -> B
   offsets (prefix sum of a B-row table on the driver);
3. one wide shuffle on the range-bucket id; each bucket kernel sorts
   by the key and emits rank = offset + local position (1-based).

Everything driver-side is O(B), never O(rows). The input is consumed
by three passes, so callers get it materialized once up front (at
deployment scale: a Parquet checkpoint via state/checkpoint.py).

`sorted_neighborhood` builds the classic ER blocking scheme
(Hernandez & Stolfo 1995, public) on top: slide a window of w over
the rank order and emit every pair closer than w. Each row lands in
window segment rank//w and is duplicated into segment s+1, so every
qualifying pair is present in exactly one segment (the higher row's
home segment); segments are hash-bucketed (stages/bucketed.py) so the
shuffle key count stays fixed — pair emission reuses the vectorized
`segment_pairs` triu kernel from stages/blocking.py.

The reference's blocking is key-equality folding (normalize.py fold
keys, see stages/blocking.py); sorted-neighborhood is the
order-based counterpart the brief's ER tier calls for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .blocking import segment_pairs
from .bucketed import PREP_BATCH, bucketed_apply, segments

SAMPLES_PER_BLOCK = 32


def _sample_boundaries(
    keyed: "ray.data.Dataset", okey: str, num_buckets: int
) -> np.ndarray:
    """B-1 range boundaries from deterministic per-block key samples."""

    def sample(t: pa.Table) -> pa.Table:
        k = t[okey].to_numpy(zero_copy_only=False)
        step = max(1, len(k) // SAMPLES_PER_BLOCK)
        return pa.table({"k": np.sort(k)[::step]})

    pooled = np.sort(
        np.concatenate(
            [
                b["k"].to_numpy(zero_copy_only=False)
                for b in keyed.map_batches(
                    sample, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            ]
        )
    )
    # driver memory stays bounded even at millions of input blocks
    if len(pooled) > (1 << 20):
        pooled = pooled[:: len(pooled) // (1 << 20) + 1]
    qs = np.linspace(0, 1, num_buckets + 1)[1:-1]
    idx = np.minimum(
        (qs * len(pooled)).astype(np.int64), len(pooled) - 1
    )
    return np.unique(pooled[idx])


def global_rank(
    ds: "ray.data.Dataset",
    okey: str,
    num_buckets: int = 64,
    rank_col: str = "rank",
) -> "ray.data.Dataset":
    """Append exact 1-based global rank by the int64 column ``okey``.

    ``okey`` must be a total order (unique per row) — pack composite
    sort keys into one int64 (or split into two passes at >63 bits).
    """
    keyed = ds.materialize()
    bounds = _sample_boundaries(keyed, okey, num_buckets)

    def add_rbucket(t: pa.Table) -> pa.Table:
        k = t[okey].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_rbucket",
            pa.array(np.searchsorted(bounds, k, side="right")),
        )

    def partial_counts(t: pa.Table) -> pa.Table:
        rb, c = np.unique(
            t["_rbucket"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"_rbucket": rb, "n": c})

    from ray.data.aggregate import Sum

    counts = (
        keyed.map_batches(add_rbucket, batch_format="pyarrow")
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("_rbucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("_rbucket")
    )
    offsets = dict(
        zip(
            counts["_rbucket"].to_numpy(),
            np.concatenate(([0], counts["n"].cumsum().to_numpy()[:-1])),
        )
    )

    def rank_bucket(t: pa.Table) -> pa.Table:
        rb = int(t["_rbucket"][0].as_py())
        k = t[okey].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        rank = np.empty(len(k), dtype=np.int64)
        rank[order] = offsets[rb] + np.arange(1, len(k) + 1)
        return t.drop_columns(["_rbucket"]).append_column(
            rank_col, pa.array(rank)
        )

    return (
        keyed.map_batches(
            add_rbucket, batch_format="pyarrow", batch_size=PREP_BATCH
        )
        .groupby("_rbucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def sorted_neighborhood(
    ds: "ray.data.Dataset",
    okey: str,
    id_col: str,
    window: int,
    num_buckets: int = 64,
    with_ranks: bool = False,
) -> "ray.data.Dataset":
    """All id pairs within ``window`` positions of each other in the
    global ``okey`` order: (id_a, id_b), rank_a < rank_b,
    rank_b - rank_a < window. Output ids ride the rank order (id_a is
    the lower-ranked row). ``with_ranks=True`` additionally emits the
    1-based global ranks (rank_a, rank_b) — the handle progressive
    resolution needs to order its comparison schedule.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_rank(
        ds.select_columns([id_col, okey]), okey, num_buckets
    )

    def explode(t: pa.Table) -> pa.Table:
        rank = t["rank"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        seg = (rank - 1) // window
        return pa.table(
            {
                "_seg": np.concatenate([seg, seg + 1]),
                "rank": np.concatenate([rank, rank]),
                "id": np.concatenate([ids, ids]),
                # original-segment flag: a pair is emitted only in the
                # HIGHER row's home segment, so each pair appears once
                "orig": np.concatenate(
                    [
                        np.ones(len(rank), dtype=bool),
                        np.zeros(len(rank), dtype=bool),
                    ]
                ),
            }
        )

    def pairs_bucket(t: pa.Table) -> pa.Table:
        seg = t["_seg"].to_numpy(zero_copy_only=False)
        rank = t["rank"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        orig = t["orig"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rank, seg))
        seg, rank, ids, orig = (
            seg[order],
            rank[order],
            ids[order],
            orig[order],
        )
        starts, sizes = segments(seg)
        a, b = segment_pairs(starts, sizes, cap=None)
        if len(a) == 0:
            empty = {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
            }
            if with_ranks:
                empty["rank_a"] = pa.array([], type=pa.int64())
                empty["rank_b"] = pa.array([], type=pa.int64())
            return pa.table(empty)
        keep = (rank[b] - rank[a] < window) & orig[b]
        a, b = a[keep], b[keep]
        cols = {
            "id_a": pa.array(ids[a], type=pa.int64()),
            "id_b": pa.array(ids[b], type=pa.int64()),
        }
        if with_ranks:
            cols["rank_a"] = pa.array(rank[a], type=pa.int64())
            cols["rank_b"] = pa.array(rank[b], type=pa.int64())
        return pa.table(cols)

    exploded = ranked.map_batches(
        explode, batch_format="pyarrow", batch_size=PREP_BATCH
    )
    return bucketed_apply(exploded, "_seg", pairs_bucket, num_buckets)


def adaptive_snm(
    ds: "ray.data.Dataset",
    okey: str,
    id_col: str,
    *,
    phi: int,
    max_island: int,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """ADAPTIVE sorted-neighborhood (Yan, Lee, Kan & Giles, the
    adaptive SNM family of JCDL/ICDM 2007): instead of a FIXED window
    over the sort order, the window grows while consecutive sort keys
    stay close — rows partition into ISLANDS at every gap
    okey[i] - okey[i-1] > ``phi`` (the classic gaps-and-islands), and
    all pairs within an island of 2..``max_island`` members are
    emitted. Larger islands are purged (a dense key region carries no
    ordering signal; the SQL mirror applies the identical HAVING) and
    reported through the counters sidecar. Output (id_a, id_b,
    island), id_a < id_b, island = the 0-based count of gap breaks
    before the row in (okey, id) order — matching a SQL
    sum(brk) OVER (ORDER BY okey, id) mirror exactly.

    Unlike `global_rank`, ``okey`` need NOT be unique: equal keys
    always share an island (gap 0), and range partitioning sends
    equal keys to one bucket, so island assignment is deterministic.

    Scale shape: one O(B)-driver metadata pass (per range bucket:
    min/max key + internal break count -> island offsets), one
    assignment pass, one island-hash shuffle for pair emission —
    never a row inventory on the driver.
    """
    from ..state import counters

    keyed = ds.select_columns([id_col, okey]).materialize()
    bounds = _sample_boundaries(keyed, okey, num_buckets)

    def add_rbucket(t: pa.Table) -> pa.Table:
        k = t[okey].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_rbucket",
            pa.array(np.searchsorted(bounds, k, side="right")),
        )

    bucketed = keyed.map_batches(
        add_rbucket, batch_format="pyarrow", batch_size=PREP_BATCH
    )

    def bucket_meta(t: pa.Table) -> pa.Table:
        k = np.sort(t[okey].to_numpy(zero_copy_only=False))
        breaks = int((np.diff(k) > phi).sum())
        return pa.table(
            {
                "_rbucket": pa.array(
                    [int(t["_rbucket"][0].as_py())], type=pa.int64()
                ),
                "kmin": pa.array([int(k[0])], type=pa.int64()),
                "kmax": pa.array([int(k[-1])], type=pa.int64()),
                "breaks": pa.array([breaks], type=pa.int64()),
            }
        )

    meta = (
        bucketed.groupby("_rbucket")
        .map_groups(bucket_meta, batch_format="pyarrow")
        .to_pandas()
        .sort_values("_rbucket")
        .reset_index(drop=True)
    )
    # island offset per bucket: breaks in all earlier buckets plus the
    # boundary break between each adjacent bucket pair
    offsets: dict[int, int] = {}
    running = 0
    prev_max = None
    for rb, kmin, kmax, brk in zip(
        meta["_rbucket"], meta["kmin"], meta["kmax"], meta["breaks"]
    ):
        if prev_max is not None and kmin - prev_max > phi:
            running += 1
        offsets[int(rb)] = running
        running += int(brk)
        prev_max = kmax

    def assign_islands(t: pa.Table) -> pa.Table:
        rb = int(t["_rbucket"][0].as_py())
        k = t[okey].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, ids = k[order], ids[order]
        brk = np.zeros(len(k), dtype=np.int64)
        brk[1:] = (np.diff(k) > phi).astype(np.int64)
        island = offsets[rb] + np.cumsum(brk)
        return pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "island": pa.array(island, type=pa.int64()),
            }
        )

    islands = bucketed.groupby("_rbucket").map_groups(
        assign_islands, batch_format="pyarrow"
    )

    def island_pairs(t: pa.Table) -> pa.Table:
        isl = t["island"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, isl))
        isl, ids = isl[order], ids[order]
        starts, sizes = segments(isl)
        purged = sizes > max_island
        if purged.any():
            ps = sizes[purged].astype(np.int64)
            counters.add_many(
                {
                    "adaptive_snm_purged_islands": int(purged.sum()),
                    "adaptive_snm_purged_pairs": int(
                        (ps * (ps - 1) // 2).sum()
                    ),
                }
            )
        keep = (sizes >= 2) & ~purged
        a, b = segment_pairs(starts[keep], sizes[keep], cap=None)
        return pa.table(
            {
                "id_a": pa.array(ids[a], type=pa.int64()),
                "id_b": pa.array(ids[b], type=pa.int64()),
                "island": pa.array(isl[a], type=pa.int64()),
            }
        )

    return bucketed_apply(islands, "island", island_pairs, num_buckets)
