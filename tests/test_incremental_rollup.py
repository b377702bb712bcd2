"""incremental_rollup: base-aggregate + CDC-delta maintenance must
equal a from-scratch rollup of the new snapshot, including custkeys
whose count churns to zero (dropped) and keys created by inserts."""


import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_incremental_rollup


def _expected(orderkeys, custkeys):
    # mirrors _snapshot_sides' new-side rule: drop k % 7 == 2, bump
    # custkey by 1 where k % 13 == 5
    out = {}
    for k, c in zip(orderkeys, custkeys):
        if k % 7 == 2:
            continue
        c2 = c + 1 if k % 13 == 5 else c
        out[c2] = out.get(c2, 0) + 1
    return dict(sorted(out.items()))


@pytest.mark.usefixtures("ray_session")
def test_maintenance_equals_recompute(tmp_path):
    # orderkeys engineered to hit every branch:
    #  - k=9 (k%7=2): new-side delete
    #  - k=3 (k%10=3): old-side missing -> insert in the delta
    #  - k=18 (k%13=5): custkey bump -> update pair
    #  - custkey 99 has ONE order with k=23 (k%7=2): churns to zero
    orderkeys = [1, 3, 5, 9, 14, 18, 23, 26, 31, 40, 44, 57, 70, 200]
    custkeys = [7, 7, 8, 8, 7, 20, 99, 20, 8, 7, 20, 8, 7, 31]
    t = pa.table(
        {
            "o_orderkey": pa.array(orderkeys, type=pa.int64()),
            "o_custkey": pa.array(custkeys, type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet", row_group_size=4)

    got = (
        q_incremental_rollup(str(tmp_path))
        .to_pandas()
        .sort_values("custkey")
        .reset_index(drop=True)
    )
    want = _expected(orderkeys, custkeys)
    assert dict(zip(got["custkey"], got["n_orders"])) == want
    # the churned-to-zero custkey is absent
    assert 99 not in set(got["custkey"])
    # the update branch really moved an order: custkey 21 exists only
    # via the k=18 bump
    assert want.get(21, 0) == 1 and 21 in set(got["custkey"])
