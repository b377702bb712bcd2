"""item_cosine_similarity: hand-built baskets with exact cosine
values, support-floor exclusion, and within-basket duplicate rows
counting once."""

import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.graph import item_cosine_similarity


def _ds(baskets):
    rows = [
        (g, i) for g, items in enumerate(baskets) for i in items
    ]
    t = pa.table(
        {
            "g": pa.array([r[0] for r in rows], type=pa.int64()),
            "i": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(3)


@pytest.mark.usefixtures("ray_session")
def test_exact_cosines():
    # items: 1 in baskets {0,1,2}; 2 in {0,1,2}; 3 in {0}; 4 in {3}
    # duplicate rows of item 1 in basket 0 must count once
    baskets = [[1, 1, 2, 3], [1, 2], [1, 2], [4]]
    out = item_cosine_similarity(
        _ds(baskets), "g", "i", threshold=0.1, min_support=2
    ).to_pandas()
    sims = {
        (a, b): (c, s)
        for a, b, c, s in zip(
            out["item_a"], out["item_b"], out["co_groups"], out["cosine"]
        )
    }
    # co(1,2)=3, deg1=deg2=3 -> cosine 1.0
    assert sims[(1, 2)] == (3, pytest.approx(1.0))
    # co(1,3)=1 < min_support -> absent
    assert (1, 3) not in sims
    assert (2, 3) not in sims
    assert len(sims) == 1


@pytest.mark.usefixtures("ray_session")
def test_threshold_filters():
    # co(5,6)=2, deg5=2, deg6=50 -> cosine 0.2; threshold above cuts
    baskets = [[5, 6], [5, 6]] + [[6]] * 48
    hi = item_cosine_similarity(
        _ds(baskets), "g", "i", threshold=0.25, min_support=2
    ).to_pandas()
    assert len(hi) == 0
    lo = item_cosine_similarity(
        _ds(baskets), "g", "i", threshold=0.15, min_support=2
    ).to_pandas()
    assert list(zip(lo["item_a"], lo["item_b"])) == [(5, 6)]
    assert lo["cosine"][0] == pytest.approx(0.2)
