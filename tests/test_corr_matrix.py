"""corr_matrix: planted columns with known correlations — exact +1
and -1 on linear relations, ~0 on independents, values matching
numpy.corrcoef, and block-split invariance of the moment partials."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_corr_matrix


@pytest.mark.usefixtures("ray_session")
def test_planted_correlations(tmp_path):
    rng = np.random.RandomState(4)
    n = 3000
    q = rng.uniform(1, 50, n)
    price = 1000.0 + 600.0 * q  # corr(q, price) = +1
    disc = np.round(0.1 - 0.001 * q, 6)  # corr(q, disc) = -1
    tax = rng.uniform(0, 0.08, n)  # independent
    t = pa.table(
        {
            "l_quantity": pa.array(np.round(q, 2)),
            "l_extendedprice": pa.array(
                np.round(1000.0 + 600.0 * np.round(q, 2), 2)
            ),
            "l_discount": pa.array(
                np.round(0.1 - 0.001 * np.round(q, 2), 6)
            ),
            "l_tax": pa.array(np.round(tax, 2)),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet", row_group_size=256)

    got = (
        q_corr_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["col_a", "col_b"])["corr"]
    )
    assert got[("l_quantity", "l_extendedprice")] == pytest.approx(
        1.0, abs=1e-5
    )
    assert got[("l_quantity", "l_discount")] == pytest.approx(
        -1.0, abs=1e-5
    )
    # independent pair ~ 0 and equal to numpy's estimate
    ref = np.corrcoef(
        t["l_quantity"].to_numpy(), t["l_tax"].to_numpy()
    )[0, 1]
    assert got[("l_quantity", "l_tax")] == pytest.approx(ref, abs=1e-5)
    assert abs(got[("l_quantity", "l_tax")]) < 0.1
