"""Vectorized similarity kernels vs slow scalar references."""

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bern_ray.core.similarity import (
    _jaro_scalar,
    _jaro_winkler_scalar,
    _levenshtein_scalar,
    cosine_pairs,
    jaro,
    jaro_winkler,
    levenshtein,
    ngram_hash_vectors,
)

ALPHA = "abcXYZ 0-_"


def _rand_pairs(n=500, seed=3):
    rng = random.Random(seed)
    words = [
        "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 24)))
        for _ in range(200)
    ]
    A = [rng.choice(words) for _ in range(n)]
    B = [rng.choice(words) for _ in range(n)]
    for i in range(0, n, 4):
        B[i] = A[i][: max(0, len(A[i]) - 1)] + "q"
    return A, B


def test_levenshtein_matches_scalar():
    A, B = _rand_pairs()
    got = levenshtein(A, B)
    for i in range(len(A)):
        assert got[i] == _levenshtein_scalar(A[i], B[i])


def test_jaro_matches_scalar():
    A, B = _rand_pairs(seed=11)
    got = jaro(A, B)
    for i in range(len(A)):
        assert abs(got[i] - _jaro_scalar(A[i], B[i])) < 1e-12


def test_jaro_winkler_matches_scalar():
    A, B = _rand_pairs(seed=13)
    got = jaro_winkler(A, B)
    for i in range(len(A)):
        assert abs(got[i] - _jaro_winkler_scalar(A[i], B[i])) < 1e-12


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=ALPHA, max_size=30), st.text(alphabet=ALPHA, max_size=30)
)
def test_kernels_property(a, b):
    assert levenshtein([a], [b])[0] == _levenshtein_scalar(a, b)
    assert abs(jaro_winkler([a], [b])[0] - _jaro_winkler_scalar(a, b)) < 1e-12


def test_ngram_cosine_identity_and_bounds():
    strs = ["hello world", "hello world", "completely other", ""]
    E = ngram_hash_vectors(strs)
    c = cosine_pairs(E[:1], E[1:2])
    assert abs(c[0] - 1.0) < 1e-6
    c2 = cosine_pairs(E[:1], E[2:3])
    assert c2[0] < 0.5
    assert np.linalg.norm(E[3]) == 0.0
