"""benford_digits: planted digit distribution — exact counts per
first digit and the chi-squared arithmetic against hand-computed
Benford expectations."""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_benford_digits


@pytest.mark.usefixtures("ray_session")
def test_planted_digit_counts(tmp_path):
    # prices whose cents start with known digits:
    # 1xx -> 1.23, 2xx -> 2.50, 9xx -> 9.99 etc.
    prices = [1.23] * 5 + [2.50] * 3 + [9.99] * 2
    t = pa.table(
        {
            "o_orderkey": pa.array(
                range(len(prices)), type=pa.int64()
            ),
            "o_totalprice": pa.array(prices, type=pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet", row_group_size=3)

    got = (
        q_benford_digits(str(tmp_path))
        .to_pandas()
        .set_index("digit")
        .sort_index()
    )
    assert dict(got["n"]) == {1: 5, 2: 3, 9: 2}
    n = 10.0
    for d in (1, 2, 9):
        e = math.log10(1 + 1 / d) * n
        assert got.loc[d, "expected"] == pytest.approx(e, abs=1e-6)
        assert got.loc[d, "chi2_part"] == pytest.approx(
            (got.loc[d, "n"] - e) ** 2 / e, abs=1e-5
        )
