"""Canopy clustering invariants: full coverage, seed separation,
membership threshold, identical-doc co-canopy, cap counter."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

LOOSE, TIGHT = 0.4, 0.7


@pytest.fixture(scope="module")
def canopies(ray_session):
    import duckdb
    import ray.data

    from bern_ray.functions.canopy import canopy_blocking

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = canopy_blocking(docs, loose=LOOSE, tight=TIGHT).to_pandas()
    con = duckdb.connect()
    texts = con.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    return out, texts


def _shingle_map(texts):
    from bern_ray.functions.dedup import _shingle_sets

    sets = _shingle_sets(texts.text.tolist(), 3)
    return dict(zip(texts.doc_id.tolist(), sets))


def _jac(a, b):
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def test_every_doc_is_covered(canopies):
    """loose <= 2*tight - 1 guarantees full coverage (1-jaccard is a
    metric; see functions/canopy.py docstring)."""
    out, texts = canopies
    assert LOOSE <= 2 * TIGHT - 1 + 1e-9
    assert set(out.doc_id) == set(texts.doc_id)


def test_seed_separation(canopies):
    """Global seeds are pairwise below the tight threshold."""
    out, texts = canopies
    sm = _shingle_map(texts)
    seeds = sorted(set(out.canopy_id))
    assert len(seeds) > 1
    for i, a in enumerate(seeds):
        for b in seeds[i + 1 :]:
            if len(sm[a]) and len(sm[b]):
                assert _jac(sm[a], sm[b]) < TIGHT, (a, b)


def test_membership_threshold(canopies):
    """Every membership row is either the seed itself (sim 1.0) or a
    doc at cheap_sim >= loose, and the recorded sim matches the exact
    shingle jaccard."""
    out, texts = canopies
    sm = _shingle_map(texts)
    assert ((out.cheap_sim >= LOOSE - 1e-9) | (out.doc_id == out.canopy_id)).all()
    sample = out.sample(n=min(200, len(out)), random_state=7)
    for r in sample.itertuples():
        if r.doc_id == r.canopy_id:
            assert r.cheap_sim == 1.0
        else:
            assert abs(_jac(sm[r.canopy_id], sm[r.doc_id]) - r.cheap_sim) < 1e-6


def test_identical_docs_share_a_canopy(ray_session):
    import pandas as pd
    import ray.data

    from bern_ray.functions.canopy import canopy_blocking

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [{"doc_id": i, "text": text} for i in range(10)]
    rows += [
        {"doc_id": 100 + i, "text": f"totally different corpus {i} "
                                    f"with its own words number {i}"}
        for i in range(3)
    ]
    out = canopy_blocking(
        ray.data.from_items(rows), loose=LOOSE, tight=TIGHT
    ).to_pandas()
    # the 10 identical docs collapse into ONE canopy seeded by doc 0
    dup = out[out.doc_id < 100]
    assert set(dup.canopy_id) == {0}
    assert len(dup) == 10
    assert (dup.cheap_sim == 1.0).all()


def test_seed_cap_counter(ray_session):
    import ray.data

    from bern_ray.functions.canopy import canopy_blocking
    from bern_ray.state import counters

    rows = [
        {"doc_id": i, "text": f"unique{i} alone{i} words{i} here{i}"}
        for i in range(30)
    ]
    counters.reset()
    out = canopy_blocking(
        ray.data.from_items(rows), loose=LOOSE, tight=TIGHT, max_seeds=5
    ).to_pandas()
    assert counters.snapshot().get("canopy_seeds_capped", 0) >= 1
    # capped run still emits only valid canopies
    assert len(set(out.canopy_id)) <= 5
