"""Distributed B³ vs a brute-force per-item reference implementation,
plus the degenerate cases (perfect clustering, all-in-one, null
gold exclusion)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.evaluation import bcubed


def _brute_b3(pred, gold):
    pred = np.asarray(pred)
    gold = np.asarray(gold)
    n = len(pred)
    p = r = 0.0
    for i in range(n):
        c = pred == pred[i]
        g = gold == gold[i]
        both = (c & g).sum()
        p += both / c.sum()
        r += both / g.sum()
    return p / n, r / n


def _run(pred, gold):
    t = pa.table(
        {
            "pred": pa.array(pred, type=pa.string()),
            "gold": pa.array(gold, type=pa.string()),
        }
    )
    return (
        bcubed(ray.data.from_arrow(t).repartition(3), "pred", "gold")
        .to_pandas()
        .iloc[0]
    )


@pytest.mark.usefixtures("ray_session")
def test_matches_brute_force():
    rng = np.random.default_rng(7)
    pred = [f"c{v}" for v in rng.integers(0, 6, size=80)]
    gold = [f"g{v}" for v in rng.integers(0, 5, size=80)]
    out = _run(pred, gold)
    p, r = _brute_b3(pred, gold)
    assert out["n_items"] == 80
    assert abs(out["b3_precision"] - round(p, 6)) < 1e-9
    assert abs(out["b3_recall"] - round(r, 6)) < 1e-9
    f1 = 2 * p * r / (p + r)
    assert abs(out["b3_f1"] - round(f1, 6)) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_perfect_and_degenerate():
    # perfect clustering: everything 1.0
    out = _run(["a", "a", "b", "b", "c"], ["x", "x", "y", "y", "z"])
    assert out["b3_precision"] == 1.0
    assert out["b3_recall"] == 1.0
    assert out["b3_f1"] == 1.0
    # one mega-cluster over 2 equal gold groups: precision 0.5, recall 1
    out = _run(["a", "a", "a", "a"], ["x", "x", "y", "y"])
    assert out["b3_precision"] == 0.5
    assert out["b3_recall"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_null_gold_excluded():
    t = pa.table(
        {
            "pred": pa.array(["a", "a", "b"], type=pa.string()),
            "gold": pa.array(["x", None, "y"], type=pa.string()),
        }
    )
    out = (
        bcubed(ray.data.from_arrow(t), "pred", "gold").to_pandas().iloc[0]
    )
    assert out["n_items"] == 2
    assert out["b3_precision"] == 1.0
    assert out["b3_recall"] == 1.0
