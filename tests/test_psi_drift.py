"""psi_drift: planted cohort shift — identical cohorts yield PSI ~ 0
(only smoothing noise); a shifted current cohort concentrates mass in
the top bins and PSI rises above the standard 0.2 alert line. Bin
counts are pinned against a scalar decile walk."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import PSI_BINS, q_psi_drift


def _write(tmp_path, keys, prices):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, type=pa.int64()),
                "o_totalprice": pa.array(prices, type=pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
        row_group_size=64,
    )


@pytest.mark.usefixtures("ray_session")
def test_identical_cohorts_near_zero(tmp_path):
    rng = np.random.RandomState(1)
    vals = np.round(rng.uniform(10, 1000, 500), 2)
    # even keys (ref) and odd keys (cur) get the SAME values
    keys = np.arange(1000)
    prices = np.repeat(vals, 2)
    _write(tmp_path, keys, prices)
    out = q_psi_drift(str(tmp_path)).to_pandas()
    assert len(out) == PSI_BINS
    assert out["n_ref"].sum() == 500 and out["n_cur"].sum() == 500
    assert abs(out["psi_term"].sum()) < 1e-4


@pytest.mark.usefixtures("ray_session")
def test_shifted_cohort_alerts(tmp_path):
    rng = np.random.RandomState(2)
    ref = np.round(rng.uniform(10, 1000, 400), 2)
    cur = np.round(rng.uniform(800, 1200, 400), 2)  # upward shift
    keys = np.concatenate(
        [np.arange(400) * 2, np.arange(400) * 2 + 1]
    )
    prices = np.concatenate([ref, cur])
    _write(tmp_path, keys, prices)
    out = (
        q_psi_drift(str(tmp_path))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    # scalar decile walk on the reference cohort
    cents = np.rint(ref * 100).astype(np.int64)
    order = np.lexsort((np.arange(400) * 2, cents))
    s = cents[order]
    edges = np.array(
        [s[(k * 400) // PSI_BINS] for k in range(1, PSI_BINS)]
    )
    want_ref = np.bincount(
        np.searchsorted(edges, cents, side="right"), minlength=PSI_BINS
    )
    assert list(out["n_ref"]) == list(want_ref)
    # the shifted cohort concentrates in the top bin and alerts
    assert out["n_cur"].to_numpy()[-1] > 200
    assert out["psi_term"].sum() > 0.2
