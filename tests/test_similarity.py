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


def _pair_batch(surfs_a, surfs_b):
    import pyarrow as pa

    n = len(surfs_a)
    return pa.table(
        {
            "a_mid": pa.array(range(n), type=pa.int64()),
            "b_mid": pa.array(range(n, 2 * n), type=pa.int64()),
            "a_surface": pa.array(surfs_a, type=pa.string()),
            "b_surface": pa.array(surfs_b, type=pa.string()),
            "a_oid": pa.array([None] * n, type=pa.string()),
            "b_oid": pa.array([None] * n, type=pa.string()),
            "block_key": pa.array(["k"] * n, type=pa.string()),
        }
    )


def _constant_model():
    """A picklable 'model' loader: every surface embeds to the same
    unit vector (cosine == 1 for all pairs)."""

    def embed(surfaces):
        E = np.zeros((len(surfaces), 4))
        E[:, 0] = 1.0
        return E

    return embed


def test_scorer_model_seam_loaded_once_and_used():
    """The per-actor model seam: model_loader runs in __init__ (once
    per scorer instance) and its embeddings drive the cosine
    component of the ensemble."""
    from bern_ray.stages.scoring import PairScorer

    batch = _pair_batch(["abcd", "wxyz"], ["efgh", "wxyz"])
    default = PairScorer()(batch)
    custom = PairScorer(model_loader=_constant_model)(batch)
    s_def = default["score"].to_pylist()
    s_cus = custom["score"].to_pylist()
    # constant model forces cosine=1 for the dissimilar pair, raising
    # its score above the default hashed-ngram cosine (~0)
    assert s_cus[0] > s_def[0]
    # identical surfaces: cosine already ~1 under both models (the
    # default embeds in float32, hence the loose tolerance)
    assert abs(s_cus[1] - s_def[1]) < 1e-6


def test_scorer_model_seam_through_actor_pool(ray_session):
    """End-to-end through map_batches actor pool: fn_constructor_kwargs
    carries the loader, built once per actor, applied per batch."""
    import ray.data

    from bern_ray.stages.scoring import PairScorer

    # defined INSIDE the test: cloudpickle then serializes it by value
    # (a module-level function in a test file pickles by reference,
    # which Ray workers cannot import -> actor restart loop)
    def constant_model():
        def embed(surfaces):
            E = np.zeros((len(surfaces), 4))
            E[:, 0] = 1.0
            return E

        return embed

    ds = ray.data.from_arrow(_pair_batch(["abcd"] * 50, ["efgh"] * 50))
    out = ds.map_batches(
        PairScorer,
        batch_format="pyarrow",
        fn_constructor_kwargs={"model_loader": constant_model},
        concurrency=(1, 2),
    ).to_pandas()
    # cosine=1 everywhere: sim = 0.3*jw + 0.3*lev + 0.4; score = 0.2*sim
    assert (out["score"] > 0.08).all()


def test_jw_and_levenshtein_match_duckdb():
    """The fuzzy-join oracle assumes our kernels are bit-equal to
    DuckDB's jaro_winkler_similarity / levenshtein. Pin it with a
    deterministic adversarial fuzz (dense alphabets force the
    transposition-halving and boost-threshold edge cases)."""
    import random

    import duckdb

    from bern_ray.core.similarity import jaro_winkler, levenshtein

    random.seed(77)
    pairs = []
    for alpha in ("ab01", "xyz"):
        for _ in range(400):
            pairs.append(
                (
                    "".join(
                        random.choice(alpha)
                        for _ in range(random.randint(1, 22))
                    ),
                    "".join(
                        random.choice(alpha)
                        for _ in range(random.randint(1, 22))
                    ),
                )
            )
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    jw = jaro_winkler(a, b)
    lev = levenshtein(a, b)
    con = duckdb.connect()
    for (x, y), j, d in zip(pairs, jw, lev):
        dj, dd = con.sql(
            "SELECT jaro_winkler_similarity(?, ?), levenshtein(?, ?)",
            params=[x, y, x, y],
        ).fetchone()
        assert abs(dj - j) < 1e-12, (x, y, j, dj)
        assert dd == int(d), (x, y, d, dd)


def test_damerau_levenshtein_matches_scalar_and_duckdb():
    """Full (unrestricted) DL: vectorized kernel vs the scalar
    Lowrance-Wagner reference AND DuckDB's damerau_levenshtein, on a
    transposition-heavy deterministic fuzz. Includes the canonical
    full-vs-OSA separator ('CA','ABC') -> 2."""
    import duckdb

    from bern_ray.core.similarity import (
        _damerau_levenshtein_scalar,
        damerau_levenshtein,
    )

    rng = random.Random(99)
    pairs = [("CA", "ABC"), ("", ""), ("", "abc"), ("ab", "ba")]
    for alpha in ("abcde", "xy"):
        for _ in range(1200):
            a = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 14))
            )
            lst = list(a)
            for _ in range(rng.randint(0, 3)):
                if len(lst) >= 2:
                    i = rng.randrange(0, len(lst) - 1)
                    lst[i], lst[i + 1] = lst[i + 1], lst[i]
            if rng.random() < 0.5 and lst:
                lst.insert(rng.randrange(len(lst)), rng.choice(alpha))
            pairs.append((a, "".join(lst)))
        for _ in range(300):
            pairs.append(
                (
                    "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
                    "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
                )
            )
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    got = damerau_levenshtein(a, b, chunk=997)  # force chunk boundaries
    assert got[0] == 2  # full DL, not OSA (OSA would say 3)
    con = duckdb.connect()
    import pandas as pd

    df = pd.DataFrame({"a": a, "b": b})
    exp = con.execute(
        "SELECT damerau_levenshtein(a, b) AS d FROM df"
    ).fetchnumpy()["d"]
    assert (got == exp).all()
    for i in range(0, len(pairs), 17):
        assert got[i] == _damerau_levenshtein_scalar(a[i], b[i])
