"""Unit tests for the distributed bucketed hash join (stages/join.py)
— the kernel behind pair-attr attach, minhash verify, and CC label
attach. Oracle: pandas merge on the same frames."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bern_ray.stages.join import bucket_join


def _mk(tbl: pa.Table, parts: int = 4):
    return ray.data.from_arrow(tbl).repartition(parts)


def test_inner_join_matches_pandas(ray_session):
    rs = np.random.RandomState(7)
    lk = rs.randint(0, 50, 200)
    left = pa.table(
        {
            "k": pa.array(lk, type=pa.int64()),
            "v": pa.array(rs.randint(0, 1000, 200), type=pa.int64()),
        }
    )
    rk = np.arange(0, 60, 2)
    right = pa.table(
        {
            "rk": pa.array(rk, type=pa.int64()),
            "name": pa.array([f"n{k}" for k in rk], type=pa.string()),
        }
    )
    out = bucket_join(
        _mk(left),
        _mk(right),
        left_on="k",
        right_on="rk",
        left_schema={"k": pa.int64(), "v": pa.int64()},
        right_schema={"rk": pa.int64(), "name": pa.string()},
        how="inner",
        num_buckets=8,
    ).to_pandas()
    exp = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")
        .drop(columns=["rk"])
    )
    key = ["k", "v", "name"]
    assert (
        out.sort_values(key).reset_index(drop=True).equals(
            exp[key].sort_values(key).reset_index(drop=True)
        )
    )


def test_left_join_null_fills(ray_session):
    left = pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64())})
    right = pa.table(
        {
            "k": pa.array([2, 4], type=pa.int64()),
            "x": pa.array(["b", "d"], type=pa.string()),
        }
    )
    out = (
        bucket_join(
            _mk(left, 2),
            _mk(right, 2),
            left_on="k",
            right_on="k",
            left_schema={"k": pa.int64()},
            right_schema={"k": pa.int64(), "x": pa.string()},
            how="left",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["x"].tolist() == [None, "b", None, "d"]


def test_big_int64_keys_survive_exactly(ray_session):
    """64-bit hash keys above 2^53 must never pass through float64 —
    the exact corruption a numpy-backed pandas merge introduces."""
    keys = np.array(
        [(1 << 62) + 1, (1 << 62) + 2, (1 << 53) + 1, 5], dtype=np.int64
    )
    left = pa.table({"k": pa.array(keys, type=pa.int64())})
    right = pa.table(
        {
            "k": pa.array(keys[:2], type=pa.int64()),
            "tok": pa.array([[1, 2], [3]], type=pa.list_(pa.int64())),
        }
    )
    ds = bucket_join(
        _mk(left, 2),
        _mk(right, 1),
        left_on="k",
        right_on="k",
        left_schema={"k": pa.int64()},
        right_schema={"k": pa.int64(), "tok": pa.list_(pa.int64())},
        how="left",
        num_buckets=4,
    )
    # collect as Arrow: Ray's to_pandas tensor-cast chokes on ragged
    # list columns with nulls, the join output itself is fine
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    got = dict(zip(tbl["k"].to_pylist(), tbl["tok"].to_pylist()))
    assert sorted(got) == sorted(keys.tolist())
    assert got[(1 << 62) + 1] == [1, 2]
    assert got[(1 << 62) + 2] == [3]
    assert got[5] is None


def test_column_collision_rejected(ray_session):
    with pytest.raises(ValueError, match="collision"):
        bucket_join(
            _mk(pa.table({"k": pa.array([1], type=pa.int64())})),
            _mk(
                pa.table(
                    {
                        "j": pa.array([1], type=pa.int64()),
                        "k": pa.array([2], type=pa.int64()),
                    }
                )
            ),
            left_on="k",
            right_on="j",
            left_schema={"k": pa.int64()},
            right_schema={"j": pa.int64(), "k": pa.int64()},
        )


def test_outer_join(ray_session):
    """Full outer mode: matched rows join, left-only and right-only
    rows both surface with the key coalesced into the left_on column
    and the off side null-filled."""
    import pyarrow as pa

    import ray.data

    from bern_ray.stages.join import bucket_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], type=pa.int64()),
                "lv": pa.array([10, 20, 30], type=pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k2": pa.array([2, 3, 4], type=pa.int64()),
                "rv": pa.array([200, 300, 400], type=pa.int64()),
            }
        )
    )
    out = (
        bucket_join(
            left,
            right,
            left_on="k",
            right_on="k2",
            left_schema={"k": pa.int64(), "lv": pa.int64()},
            right_schema={"k2": pa.int64(), "rv": pa.int64()},
            how="outer",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].tolist()[:3] == [10, 20, 30]
    assert pa.Table.from_pandas(out).column("lv").null_count == 1
    assert out["rv"].tolist()[1:] == [200, 300, 400]
    assert pa.Table.from_pandas(out).column("rv").null_count == 1
