"""Affine-gap similarity (core/similarity.py affine_gap_sim).

Layers: fuzz of the vectorized single-row-loop Gotoh against the
textbook three-matrix scalar DP (random + structured contiguous-insert
pairs); the contiguous-vs-scattered gap property that motivates the
measure over Levenshtein (Bilenko & Mooney 2003); boundary cases; and
the parameter guard (the cummax unrolling needs gap_open >= extend).
"""

import random

import numpy as np
import pytest

from bern_ray.core.similarity import (
    _affine_gap_scalar,
    affine_gap_sim,
    levenshtein_sim,
)

ALPHA = "abcdef #,."


def test_fuzz_matches_scalar_reference():
    random.seed(41)
    pairs = []
    for _ in range(400):
        a = "".join(
            random.choice(ALPHA) for _ in range(random.randint(0, 12))
        )
        b = "".join(
            random.choice(ALPHA) for _ in range(random.randint(0, 12))
        )
        pairs.append((a, b))
    for _ in range(100):  # structured: contiguous insertions
        a = "".join(random.choice(ALPHA) for _ in range(10))
        pos = random.randint(0, 10)
        ins = "".join(
            random.choice(ALPHA) for _ in range(random.randint(1, 6))
        )
        pairs.append((a, a[:pos] + ins + a[pos:]))
    got = affine_gap_sim([p[0] for p in pairs], [p[1] for p in pairs])
    for i, (a, b) in enumerate(pairs):
        assert got[i] == pytest.approx(
            _affine_gap_scalar(a, b), abs=1e-9
        ), (a, b)


def test_contiguous_beats_scattered():
    a = "abcdefghij"
    contig = "abcdeXXXXXfghij"
    scattered = "aXbcXdeXfgXhiXj"
    aff = affine_gap_sim([a, a], [contig, scattered])
    lev = levenshtein_sim([a, a], [contig, scattered])
    # Levenshtein cannot tell the two apart; affine strongly prefers
    # the single contiguous run (one open + four extends vs five opens)
    assert lev[0] == lev[1]
    assert aff[0] > aff[1] + 0.2


def test_boundaries():
    out = affine_gap_sim(
        ["", "", "abc", "abc"], ["", "xyz", "abc", "xyz"]
    )
    assert out[0] == 1.0  # empty vs empty
    assert out[1] == 0.0  # empty vs non-empty: one clipped gap run
    assert out[2] == 1.0  # identical
    assert out[3] == 0.0  # all-mismatch clips at 0
    assert affine_gap_sim([], []).shape == (0,)


def test_gap_open_guard():
    with pytest.raises(ValueError):
        affine_gap_sim(["a"], ["b"], gap_open=0.1, gap_extend=0.5)


def test_asymmetric_lengths_and_symmetry():
    random.seed(7)
    a = ["".join(random.choice(ALPHA) for _ in range(3)) for _ in range(50)]
    b = [
        "".join(random.choice(ALPHA) for _ in range(17)) for _ in range(50)
    ]
    ab = affine_gap_sim(a, b)
    ba = affine_gap_sim(b, a)
    np.testing.assert_allclose(ab, ba, atol=1e-12)
