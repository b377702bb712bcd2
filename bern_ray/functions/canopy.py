"""Canopy clustering — cheap-distance overlapping pre-blocking.

McCallum, Nigam & Ungar (KDD 2000): before expensive pairwise
scoring, group records into OVERLAPPING canopies with a cheap
similarity (here: exact token-shingle Jaccard, computed by one
vectorized np.isin sweep per seed); the expensive ER stage then runs
only within canopies. Complements this repo's key-based blocking
(stages/blocking.py) and meta-blocking family with the classic
distance-threshold scheme the reference's dictionary keys can't
express (surface variants with no shared fold key still land in one
canopy when their shingle sets overlap).

Two-level distributed shape (the standard scale variant, e.g.
Mahout's canopy): (1) per-partition greedy seed selection — loop over
SEEDS only, each step one vectorized Jaccard sweep over the partition
— (2) the same greedy over the (bounded, counter-guarded) local-seed
union on the driver, (3) broadcast global seeds once via ray.put and
assign every doc to every canopy within `loose`, one np.isin sweep
per seed per batch.

Determinism: greedy order is ascending doc_id at both levels, so the
result is a pure function of (partitioning, thresholds); the pytest
pins the structural invariants instead of one layout's byte output.

Coverage theorem (1 - Jaccard is a metric): every doc is within
`tight`-distance of some local seed, every local seed within
`tight`-distance of a global seed, so every doc is within
2*(1-tight) of a global seed — choosing loose <= 2*tight - 1
guarantees EVERY doc lands in at least one canopy. The defaults
(loose=0.4, tight=0.7) satisfy the bound with equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dedup import _shingle_list_rows

# driver guard for the stage-2 seed union: local seeds are pairwise
# >= (1-tight) apart within a partition, so the union is ~#partitions
# x packing-bound sized; a pathological corpus (every doc unique and
# dissimilar) degenerates to one seed per doc — the cap keeps stage 2
# driver-safe and the elision is reported via the counters sidecar
MAX_SEEDS = 200_000


def _tok_arrays(t: pa.Table):
    col = t["tok"].combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)
    flat = flat[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    return col, flat, offsets


def _seed_sweep(
    seed: np.ndarray, flat: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Jaccard of ONE seed set vs EVERY doc of a batch: one np.isin
    over the flat token buffer + one segment reduceat. Empty segments
    (docs below the shingle minimum) score 0."""
    n = len(offsets) - 1
    sizes = np.diff(offsets)
    out = np.zeros(n)
    if len(flat) == 0 or len(seed) == 0:
        return out
    hit = np.isin(flat, seed).astype(np.int64)
    starts = offsets[:-1].clip(max=len(flat) - 1)
    inter = np.add.reduceat(hit, starts)
    # reduceat artifacts on empty/clipped segments are masked out
    inter = np.where(sizes > 0, inter, 0)
    union = sizes + len(seed) - inter
    np.divide(inter, union, out=out, where=union > 0)
    return out


def _greedy_seeds(
    ids: np.ndarray,
    flat: np.ndarray,
    offsets: np.ndarray,
    tight: float,
) -> np.ndarray:
    """Greedy canopy seed indices in ascending-doc_id order: take the
    smallest alive doc as a seed, kill everything within `tight`."""
    order = np.argsort(ids, kind="stable")
    alive = np.ones(len(ids), dtype=bool)
    seeds: list[int] = []
    for i in order:
        if not alive[i]:
            continue
        seeds.append(int(i))
        seed_set = flat[offsets[i] : offsets[i + 1]]
        if len(seed_set) == 0:
            # shingle-less doc: a singleton canopy; only kills itself
            alive[i] = False
            continue
        sim = _seed_sweep(seed_set, flat, offsets)
        alive &= sim < tight
    return np.asarray(seeds, dtype=np.int64)


def _local_seeds_fn(tight: float):
    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "tok": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        col, flat, offsets = _tok_arrays(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        idx = _greedy_seeds(ids, flat, offsets, tight)
        return pa.table(
            {
                "doc_id": pa.array(ids[idx], type=pa.int64()),
                "tok": col.take(idx),
            }
        )

    return fn


class _AssignCanopies:
    """Actor-pool assignment stage: global seed arrays land in plasma
    once (ray.put) and are fetched once per ACTOR in __init__, not per
    batch; each batch does one vectorized sweep per seed."""

    def __init__(self, seeds_ref, loose: float):
        seed_ids, seed_sets = ray.get(seeds_ref)
        self._seed_ids = seed_ids
        self._seed_sets = seed_sets
        self._loose = loose

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "canopy_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "cheap_sim": pa.array([], type=pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        _, flat, offsets = _tok_arrays(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        canopy_parts, doc_parts, sim_parts = [], [], []
        for sid, sset in zip(self._seed_ids, self._seed_sets):
            sim = _seed_sweep(sset, flat, offsets)
            m = sim >= self._loose
            # a doc that IS the seed always joins its own canopy
            m |= ids == sid
            if not m.any():
                continue
            doc_parts.append(ids[m])
            sim_parts.append(np.where(ids[m] == sid, 1.0, sim[m]))
            canopy_parts.append(
                np.full(int(m.sum()), sid, dtype=np.int64)
            )
        if not doc_parts:
            return empty
        return pa.table(
            {
                "canopy_id": pa.array(
                    np.concatenate(canopy_parts), type=pa.int64()
                ),
                "doc_id": pa.array(
                    np.concatenate(doc_parts), type=pa.int64()
                ),
                "cheap_sim": pa.array(
                    np.round(np.concatenate(sim_parts), 6)
                ),
            }
        )


def canopy_blocking(
    docs: "ray.data.Dataset",
    loose: float = 0.4,
    tight: float = 0.7,
    shingle_k: int = 3,
    max_seeds: int = MAX_SEEDS,
) -> "ray.data.Dataset":
    """-> (canopy_id = seed doc_id, doc_id, cheap_sim): overlapping
    canopy membership. Requires loose <= tight; with
    loose <= 2*tight - 1 every doc is covered by >= 1 canopy (module
    docstring). Rows-only query (two-level greedy is not
    SQL-expressible); invariants pytest-pinned (tests/test_canopy.py).
    """
    if not 0 < loose <= tight <= 1:
        raise ValueError("need 0 < loose <= tight <= 1")
    shingles = docs.map_batches(
        lambda t: _shingle_list_rows(t, shingle_k), batch_format="pyarrow"
    ).materialize()

    local = shingles.map_batches(
        _local_seeds_fn(tight), batch_format="pyarrow"
    )
    seed_rows = local.limit(max_seeds + 1).take_all()
    if len(seed_rows) > max_seeds:
        from ..state.counters import add_many

        add_many({"canopy_seeds_capped": 1})
        seed_rows = seed_rows[:max_seeds]
    ids = np.asarray([r["doc_id"] for r in seed_rows], dtype=np.int64)
    sets = [
        np.asarray(r["tok"], dtype=np.int64) for r in seed_rows
    ]
    if len(ids):
        flat = (
            np.concatenate(sets) if sets else np.empty(0, np.int64)
        )
        offsets = np.zeros(len(sets) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in sets], out=offsets[1:])
        g_idx = _greedy_seeds(ids, flat, offsets, tight)
        seed_ids = ids[g_idx]
        seed_sets = [sets[int(i)] for i in g_idx]
    else:
        seed_ids = ids
        seed_sets = []
    seeds_ref = ray.put((seed_ids, seed_sets))
    return shingles.map_batches(
        _AssignCanopies,
        fn_constructor_args=(seeds_ref, loose),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
