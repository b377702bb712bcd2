"""Variation of Information (functions/evaluation.py
variation_of_information): brute-force entropy reference, the metric
properties (zero iff identical, symmetry, triangle inequality on
random triples), and the refinement case the dedup query relies on.
"""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.evaluation import variation_of_information


def _run(pred, gold):
    t = pa.table(
        {
            "pred": pa.array([str(x) for x in pred], type=pa.string()),
            "gold": pa.array([str(x) for x in gold], type=pa.string()),
        }
    )
    return (
        variation_of_information(
            ray.data.from_arrow(t).repartition(3), "pred", "gold"
        )
        .to_pandas()
        .iloc[0]
    )


def _brute_vi(pred, gold):
    n = len(pred)

    def h(labels):
        return -sum(
            (c / n) * np.log(c / n) for c in Counter(labels).values()
        )

    hj = h(list(zip(pred, gold)))
    return (hj - h(pred)) + (hj - h(gold))


@pytest.mark.usefixtures("ray_session")
def test_matches_bruteforce_and_bound():
    rng = np.random.default_rng(5)
    for _ in range(3):
        pred = [f"c{v}" for v in rng.integers(0, 6, size=70)]
        gold = [f"g{v}" for v in rng.integers(0, 4, size=70)]
        out = _run(pred, gold)
        want = _brute_vi(pred, gold)
        assert abs(out["vi"] - round(want, 6)) < 1e-6
        assert abs(out["nvi"] - round(want / np.log(70), 6)) < 1e-6
        assert 0.0 <= out["nvi"] <= 1.0  # Meila's ln(N) bound


@pytest.mark.usefixtures("ray_session")
def test_metric_properties():
    rng = np.random.default_rng(9)
    labs = [
        [f"{a}{v}" for v in rng.integers(0, 4, size=40)]
        for a in "xyz"
    ]
    x, y, z = labs
    # zero iff identical (up to relabeling)
    assert _run(x, x)["vi"] == 0.0
    relabel = [f"r{v}" for v in x]
    assert _run(x, relabel)["vi"] == 0.0
    # symmetry
    assert _run(x, y)["vi"] == pytest.approx(_run(y, x)["vi"], abs=2e-6)
    # triangle inequality
    assert _run(x, z)["vi"] <= _run(x, y)["vi"] + _run(y, z)["vi"] + 3e-6


@pytest.mark.usefixtures("ray_session")
def test_refinement_one_sided():
    # gold refines pred: H(pred|gold) = 0, VI = H(gold|pred)
    out = _run(["a", "a", "a", "b"], ["x", "x", "y", "z"])
    assert out["h_pred_given_gold"] == 0.0
    assert out["vi"] == out["h_gold_given_pred"]
    assert out["vi"] > 0
