"""pps_sample: the systematic PPS rule vs a scalar walk — selection
probability proportional to weight, heavy rows always in, and the
bucketed distributed prefix equal to the single-pass scalar prefix."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import (
    PPS_SAMPLE_N,
    q_pps_sample,
)


def _scalar(keys, cents, n_sample):
    order = np.argsort(keys)
    k, c = np.asarray(keys)[order], np.asarray(cents)[order]
    total = int(c.sum())
    step = total // n_sample
    start = step // 2
    out = []
    cum = 0
    for kk, cc in zip(k, c):
        lo, hi = cum, cum + cc
        n_lo = 0 if lo <= start else (lo - start - 1) // step + 1
        n_hi = 0 if hi <= start else (hi - start - 1) // step + 1
        if n_hi > n_lo:
            out.append((int(kk), int(cc)))
        cum = hi
    return out


@pytest.mark.usefixtures("ray_session")
def test_pps_matches_scalar_walk(tmp_path):
    rng = np.random.RandomState(11)
    n = 3000
    keys = rng.permutation(n * 4)[:n].astype(np.int64)  # sparse keys
    price = np.round(rng.gamma(2.0, 50.0, n) + 1.0, 2)
    # one whale row heavier than the whole step: must ALWAYS be drawn
    price[7] = price.sum()
    t = pa.table(
        {
            "o_orderkey": pa.array(keys),
            "o_totalprice": pa.array(price, type=pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet", row_group_size=128)

    got = (
        q_pps_sample(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    cents = np.rint(price * 100).astype(np.int64)
    want = _scalar(keys, cents, PPS_SAMPLE_N)
    assert list(zip(got["o_orderkey"], got["weight_cents"])) == want
    # the whale spans ~half the grid points but is drawn exactly once
    # (certainty selection), so the distinct-row count drops below
    # PPS_SAMPLE_N by the points it absorbed
    assert int(keys[7]) in set(got["o_orderkey"])
    assert len(got) == len(want) < PPS_SAMPLE_N


@pytest.mark.usefixtures("ray_session")
def test_sample_size_without_heavy_tail(tmp_path):
    rng = np.random.RandomState(5)
    n = 5000
    keys = np.arange(n, dtype=np.int64)
    price = np.round(rng.uniform(10.0, 30.0, n), 2)  # no whales
    t = pa.table(
        {
            "o_orderkey": pa.array(keys),
            "o_totalprice": pa.array(price, type=pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet", row_group_size=256)
    got = q_pps_sample(str(tmp_path)).to_pandas()
    # every weight < step -> one row per grid point -> exactly the
    # grid size (best-case systematic sampling)
    assert abs(len(got) - PPS_SAMPLE_N) <= 1
