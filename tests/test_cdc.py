"""CDC snapshot diff / apply: classification, churn-sized emission,
and the diff→apply round-trip identity (functions/cdc.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from bern_ray.pipelines.relational import q_snapshot_apply, q_snapshot_diff


def _orders(tmp_path, n=400, seed=7):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "o_custkey": rng.integers(1, 50, n).astype(np.int64),
            "o_totalprice": rng.uniform(10, 1000, n).round(2),
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 365, n), unit="D"),
            "o_orderstatus": "O",
        }
    )
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    return df


def _expected_diff(df):
    old = df[df.o_orderkey % 10 != 3][["o_orderkey", "o_custkey"]]
    new = df[df.o_orderkey % 7 != 2][["o_orderkey", "o_custkey"]].copy()
    upd = new.o_orderkey % 13 == 5
    new.loc[upd, "o_custkey"] += 1
    m = old.merge(
        new, on="o_orderkey", how="outer", suffixes=("_old", "_new")
    )
    ins = m.o_custkey_old.isna()
    dele = m.o_custkey_new.isna()
    changed = ins | dele | (m.o_custkey_old != m.o_custkey_new)
    m = m[changed].copy()
    m["change"] = np.where(ins[changed], "insert",
                           np.where(dele[changed], "delete", "update"))
    return m


def test_snapshot_diff_classification(ray_session, tmp_path):
    df = _orders(tmp_path)
    out = q_snapshot_diff(str(tmp_path)).to_pandas()
    exp = _expected_diff(df)
    assert len(out) == len(exp)
    assert set(out.change) == {"insert", "delete", "update"}
    merged = out.merge(
        exp[["o_orderkey", "change", "o_custkey_old", "o_custkey_new"]],
        on="o_orderkey",
    )
    assert len(merged) == len(exp)
    assert (merged.change_x == merged.change_y).all()
    # value columns agree where present, null where absent
    upd = merged.change_x == "update"
    assert (
        merged.loc[upd, "old_custkey"] == merged.loc[upd, "o_custkey_old"]
    ).all()
    assert (
        merged.loc[upd, "new_custkey"]
        == merged.loc[upd, "o_custkey_old"] + 1
    ).all()
    assert merged.loc[merged.change_x == "insert", "old_custkey"].isna().all()
    assert merged.loc[merged.change_x == "delete", "new_custkey"].isna().all()


def test_snapshot_diff_identical_snapshots_empty(ray_session, tmp_path):
    import ray.data

    from bern_ray.functions.cdc import snapshot_diff

    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "old_custkey": pa.array([10, 20, 30], pa.int64()),
        }
    )
    t2 = pa.table(
        {
            "o_orderkey__new": pa.array([1, 2, 3], pa.int64()),
            "new_custkey": pa.array([10, 20, 30], pa.int64()),
        }
    )
    out = snapshot_diff(
        ray.data.from_arrow(t),
        ray.data.from_arrow(t2),
        key="o_orderkey",
        compare=["custkey"],
        num_buckets=4,
    ).to_pandas()
    assert len(out) == 0


def test_apply_roundtrip(ray_session, tmp_path):
    df = _orders(tmp_path, n=350, seed=11)
    out = (
        q_snapshot_apply(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    new = df[df.o_orderkey % 7 != 2][["o_orderkey", "o_custkey"]].copy()
    upd = new.o_orderkey % 13 == 5
    new.loc[upd, "o_custkey"] += 1
    new = new.rename(columns={"o_custkey": "custkey"}).sort_values(
        "o_orderkey"
    ).reset_index(drop=True)
    assert (out.o_orderkey.to_numpy() == new.o_orderkey.to_numpy()).all()
    assert (
        out.custkey.to_numpy().astype(np.int64)
        == new.custkey.to_numpy()
    ).all()
