"""skyline_parts: the vectorized non-dominated mask vs an O(n^2)
brute force (duplicate points, equal-price groups, single dim ties),
and the local-skyline-then-merge identity across many small blocks."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import _skyline_mask, q_skyline_parts


def _brute(pr, sz):
    n = len(pr)
    return np.array(
        [
            not any(
                pr[j] >= pr[i]
                and sz[j] >= sz[i]
                and (pr[j] > pr[i] or sz[j] > sz[i])
                for j in range(n)
            )
            for i in range(n)
        ]
    )


def test_mask_fuzz():
    rng = np.random.RandomState(42)
    for _ in range(300):
        n = rng.randint(1, 50)
        # small grid forces duplicates and ties
        pr = rng.randint(0, 6, n).astype(float)
        sz = rng.randint(0, 6, n)
        assert (_skyline_mask(pr, sz) == _brute(pr, sz)).all()
    assert _skyline_mask(np.array([]), np.array([])).shape == (0,)


@pytest.mark.usefixtures("ray_session")
def test_blockwise_merge_equals_global(tmp_path):
    rng = np.random.RandomState(7)
    n = 2000
    pr = rng.randint(0, 500, n).astype(float)
    sz = rng.randint(0, 50, n).astype(np.int64)
    t = pa.table(
        {
            "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
            "p_retailprice": pa.array(pr),
            "p_size": pa.array(sz),
        }
    )
    # tiny row groups -> many blocks -> the merge identity is exercised
    pq.write_table(t, tmp_path / "part.parquet", row_group_size=100)

    got = q_skyline_parts(str(tmp_path)).to_pandas()
    want = np.flatnonzero(_brute(pr, sz))
    assert list(got["p_partkey"]) == list(want)
