"""Unit tests for the bucket-and-segment scale shape
(bern_ray/stages/bucketed.py): the replacement for per-key
groupby(key).map_groups across the temporal/window family.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bern_ray.stages.bucketed import bucketed_apply, key_buckets, segments


def test_segments_single_key():
    starts, sizes = segments(np.array([1, 1, 2, 2, 2, 5]))
    assert starts.tolist() == [0, 2, 5]
    assert sizes.tolist() == [2, 3, 1]


def test_segments_multi_key():
    a = np.array([1, 1, 1, 2, 2])
    b = np.array([7, 7, 8, 8, 8])
    starts, sizes = segments(a, b)
    # breaks where EITHER column changes
    assert starts.tolist() == [0, 2, 3]
    assert sizes.tolist() == [2, 1, 2]


def test_segments_empty():
    starts, sizes = segments(np.empty(0, dtype=np.int64))
    assert len(starts) == 0 and len(sizes) == 0


def test_key_buckets_deterministic_and_bounded():
    ids = pa.array(np.arange(1000, dtype=np.int64) * 10_000_019)
    b1 = key_buckets(ids, 64)
    b2 = key_buckets(ids, 64)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < 64
    # spread: no bucket hogs the keys (the int mix must actually mix)
    counts = np.bincount(b1, minlength=64)
    assert counts.max() < 3 * (1000 / 64)
    # string keys hash deterministically too
    s = pa.array([f"url-{i}" for i in range(100)])
    assert (key_buckets(s, 16) == key_buckets(s, 16)).all()


def test_bucketed_apply_matches_per_key_groupby(ray_session):
    """A per-key ordered kernel through bucketed_apply must equal the
    naive per-key pandas computation (here: running count per key)."""
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 300, n),
            "ts": rng.integers(0, 10_000, n),
            "row_id": np.arange(n, dtype=np.int64),
        }
    )

    def kernel(t: pa.Table) -> pa.Table:
        rid = t["row_id"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, ts, k))
        starts, sizes = segments(k[order])
        occ = np.arange(t.num_rows) - np.repeat(starts, sizes) + 1
        return pa.table(
            {
                "row_id": pa.array(rid[order], type=pa.int64()),
                "occ": pa.array(occ, type=pa.int64()),
            }
        )

    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        bucketed_apply(ds, "k", kernel, num_buckets=16)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )

    exp = df.sort_values(["k", "ts", "row_id"], kind="mergesort").copy()
    exp["occ"] = exp.groupby("k").cumcount() + 1
    exp = exp.sort_values("row_id")[["row_id", "occ"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bucketed_apply_each_key_fully_in_one_call(ray_session):
    """Every row of a key must arrive in the SAME kernel invocation —
    the contract per-key ordered operators rely on."""
    df = pd.DataFrame(
        {"k": np.repeat(np.arange(50, dtype=np.int64), 20)}
    )

    def kernel(t: pa.Table) -> pa.Table:
        k = np.sort(t["k"].to_numpy(zero_copy_only=False))
        starts, sizes = segments(k)
        return pa.table(
            {
                "k": pa.array(k[starts], type=pa.int64()),
                "n": pa.array(sizes, type=pa.int64()),
            }
        )

    ds = ray.data.from_pandas(df).repartition(16)
    got = bucketed_apply(ds, "k", kernel, num_buckets=8).to_pandas()
    # one output row per key with the FULL count => never split
    assert len(got) == 50
    assert (got["n"] == 20).all()
