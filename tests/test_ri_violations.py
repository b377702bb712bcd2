"""ri_violations: planted orphans — exact row and distinct-key counts
per FK relation under the deterministic partial-parent rule."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_ri_violations


@pytest.mark.usefixtures("ray_session")
def test_planted_orphans(tmp_path):
    # customers 1..20; the census thins custkey % 10 == 3 (i.e. 3, 13)
    pq.write_table(
        pa.table({"c_custkey": pa.array(range(1, 21), type=pa.int64())}),
        tmp_path / "customer.parquet",
    )
    # orders: custkey 3 referenced twice, 13 once, others fine;
    # orderkeys chosen so % 7 == 2 thins keys 2 and 9 from the parent
    o_keys = [1, 2, 3, 4, 9, 10, 11, 12]
    o_cust = [3, 3, 13, 5, 6, 7, 8, 9]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(o_keys, type=pa.int64()),
                "o_custkey": pa.array(o_cust, type=pa.int64()),
            }
        ),
        tmp_path / "orders.parquet",
        row_group_size=3,
    )
    # lineitems: orderkey 2 referenced 3x, 9 referenced 1x -> orphans
    l_keys = [1, 2, 2, 2, 9, 10, 11]
    pq.write_table(
        pa.table({"l_orderkey": pa.array(l_keys, type=pa.int64())}),
        tmp_path / "lineitem.parquet",
        row_group_size=2,
    )

    got = (
        q_ri_violations(str(tmp_path))
        .to_pandas()
        .set_index("relation")
        .sort_index()
    )
    oc = got.loc["orders->customer"]
    assert (oc["n_child"], oc["n_orphan_rows"], oc["n_orphan_keys"]) == (
        8,
        3,
        2,
    )
    lo = got.loc["lineitem->orders"]
    assert (lo["n_child"], lo["n_orphan_rows"], lo["n_orphan_keys"]) == (
        7,
        4,
        2,
    )
