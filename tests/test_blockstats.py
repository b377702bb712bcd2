"""Block-size skew profile (stages/blocking.py block_size_stats):
brute-force reference over random size distributions, the degenerate
uniform / single-block cases, and tie-invariance of the rank-formula
Gini.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.stages.blocking import block_size_stats


def _run(sizes):
    ds = ray.data.from_arrow(
        pa.table({"n_docs": pa.array(sizes, pa.int64())})
    ).repartition(3)
    return block_size_stats(ds, "n_docs").to_pylist()[0]


def _brute(sizes):
    ss = np.sort(np.asarray(sizes, dtype=np.int64))
    n = len(ss)
    gini = float(
        ((2 * np.arange(1, n + 1) - n - 1) * ss).sum() / (n * ss.sum())
    )
    pairs = ss * (ss - 1) // 2

    def q(qq):
        return int(ss[max(1, math.ceil(qq * n)) - 1])

    return {
        "n_blocks": n,
        "n_records": int(ss.sum()),
        "max_size": int(ss[-1]),
        "p50_size": q(0.5),
        "p99_size": q(0.99),
        "gini": round(gini, 6),
        "total_pairs": int(pairs.sum()),
        "top_block_pair_share": round(
            float(pairs[-1] / pairs.sum()), 6
        ),
    }


@pytest.mark.usefixtures("ray_session")
def test_matches_bruteforce_random():
    rng = np.random.default_rng(31)
    for _ in range(3):
        sizes = rng.integers(1, 50, size=300).tolist()
        out = _run(sizes)
        for k, v in _brute(sizes).items():
            assert out[k] == v, k


@pytest.mark.usefixtures("ray_session")
def test_uniform_and_hot_block():
    # perfectly uniform sizes: gini 0, every quantile the same
    out = _run([7] * 20)
    assert out["gini"] == 0.0
    assert out["p50_size"] == out["p99_size"] == out["max_size"] == 7
    assert out["total_pairs"] == 20 * 21
    # one hot block dominating the comparison workload
    out = _run([2] * 99 + [1000])
    assert out["top_block_pair_share"] > 0.999
    assert out["p50_size"] == 2 and out["max_size"] == 1000
    assert out["gini"] > 0.8


@pytest.mark.usefixtures("ray_session")
def test_singletons_zero_pairs():
    out = _run([1, 1, 1])
    assert out["total_pairs"] == 0
    assert out["top_block_pair_share"] == 0.0
