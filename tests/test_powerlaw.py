"""degree_powerlaw: planted Pareto-distributed part frequencies — the
Hill estimator recovers the planted exponent within sampling error,
and matches a scalar computation exactly."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import HILL_DMIN, q_degree_powerlaw


@pytest.mark.usefixtures("ray_session")
def test_recovers_planted_exponent(tmp_path):
    rng = np.random.RandomState(9)
    alpha_true = 2.5
    # continuous Pareto tail starting at d_min, discretized
    n_parts = 400
    degs = np.floor(
        HILL_DMIN * (1 - rng.uniform(size=n_parts)) ** (-1 / (alpha_true - 1))
    ).astype(np.int64)
    rows = np.repeat(np.arange(n_parts, dtype=np.int64), degs)
    pq.write_table(
        pa.table({"l_partkey": pa.array(rows)}),
        tmp_path / "lineitem.parquet",
        row_group_size=4096,
    )

    out = q_degree_powerlaw(str(tmp_path)).to_pandas().iloc[0]
    # scalar reference on the exact planted degrees
    d = degs[degs >= HILL_DMIN].astype(np.float64)
    want = round(1.0 + len(d) / float(np.log(d / HILL_DMIN).sum()), 6)
    assert out["n_tail"] == len(d)
    assert out["alpha"] == pytest.approx(want, abs=1e-6)
    # and the estimate sits near the planted exponent
    assert abs(out["alpha"] - alpha_true) < 0.4
