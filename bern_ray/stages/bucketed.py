"""Bucket-and-segment: the scale shape for per-key ORDERED operators.

`groupby(key).map_groups(fn)` is one Python call per key and ~one
block per group out of the shuffle — correct, but at web scale (10^8
users / documents) it is the canonical tiny-groups scheduler death.
This module gives the replacement shape used by the pair generator
(`stages/blocking.py _emit_pairs_bucket`): shuffle ONCE on
``bucket = hash(key) % K`` (K small and fixed, independent of key
cardinality), then hand the WHOLE bucket to a vectorized kernel that
lexsorts by (key, order cols) and segments per key with numpy
run-length arithmetic — C speed inside, K Python calls total.

Every kernel gets a pyarrow.Table containing all rows of one bucket
(the ``_bucket`` column already stripped) and returns a pyarrow.Table.
The partitioning assumption is one BUCKET fits one task (tunable via
``num_buckets``), not one key — keys never need to be rare.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# Shuffle-prep bundling: parquet reads produce small blocks; feeding
# hundreds of tiny blocks into the sort barrier is superlinearly slow
# (measured: 750k rows, 0.26s @16 blocks vs 4.2s @256). Bundle first.
PREP_BATCH = 65536

_MIX = np.uint64(0x9E3779B97F4A7C15)


def key_buckets(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic int64 bucket ids for an int or string key column."""
    if pa.types.is_integer(col.type):
        k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * _MIX) >> np.uint64(33)
    else:
        # vectorized, process-stable string hash (fixed default key)
        h = pd.util.hash_array(
            np.asarray(col.to_pylist(), dtype=object)
        ).astype(np.uint64)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def bucketed_apply(
    ds: "ray.data.Dataset",
    key: str,
    fn: Callable[[pa.Table], pa.Table],
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Apply ``fn`` once per hash bucket of ``key``.

    One wide shuffle on a K-ary int key; ``fn`` sees every row whose
    key hashes to that bucket and is responsible for its own per-key
    lexsort + segmentation (see `segments` below for the helper).
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        # strip pandas metadata parquet readers attach to schemas: a
        # metadata-carrying schema is unhashable in this pyarrow, which
        # disables Ray Data's cheap schema-dedup on every block concat
        return t.replace_schema_metadata(None).append_column(
            "_bucket", pa.array(key_buckets(t[key], num_buckets))
        )

    def run(t: pa.Table) -> pa.Table:
        return fn(t.drop_columns(["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=PREP_BATCH)
        .groupby("_bucket")
        .map_groups(run, batch_format="pyarrow")
    )


def segments(*sorted_key_cols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length segmentation over already-lexsorted key columns.

    Returns (starts, sizes): ``starts[i]`` is the first row of segment
    i, ``sizes[i]`` its length. Rows i and i-1 are in the same segment
    iff every key column is equal at both positions.
    """
    n = len(sorted_key_cols[0])
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for col in sorted_key_cols:
        new[1:] |= col[1:] != col[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    return starts, sizes


def segment_starts_repeat(starts: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Per-row index of the row's own segment start (length n)."""
    return np.repeat(starts, sizes)
