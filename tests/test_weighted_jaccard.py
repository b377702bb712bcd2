"""Weighted (multiset) Jaccard near-dup (functions/dedup.py
weighted_jaccard_neardup / _tf_expanded_rows).

Layers: the positional-expansion identity (expanded-set Jaccard ==
sum-min/sum-max over term frequencies) against a Counter-based brute
force; the multiset-vs-set distinguishing case (repetition lowers
weighted similarity where set Jaccard is blind); and expansion-kernel
invariants (element count == multiset size, determinism).
"""

import re
from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.dedup import (
    _tf_expanded_rows,
    weighted_jaccard_neardup,
)

TOK = re.compile("[0-9a-zA-Z]+")


def _brute_wj(a: str, b: str) -> float:
    ca = Counter(TOK.findall(a.lower()))
    cb = Counter(TOK.findall(b.lower()))
    toks = set(ca) | set(cb)
    num = sum(min(ca[t], cb[t]) for t in toks)
    den = sum(max(ca[t], cb[t]) for t in toks)
    return num / den if den else 0.0


def _run(texts, threshold):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    rows = weighted_jaccard_neardup(ds, threshold=threshold).take_all()
    return {
        (r["doc_id_a"], r["doc_id_b"]): r["wjaccard"] for r in rows
    }


def test_expansion_invariants():
    texts = ["the cat the cat sat", "", "one two three", "the the the"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = _tf_expanded_rows(t)
    lists = out["tok"].to_pylist()
    for txt, el in zip(texts, lists):
        n_toks = len(TOK.findall(txt.lower()))
        # one distinct element per token OCCURRENCE
        assert len(el) == n_toks
        assert len(set(el)) == n_toks
        assert el == sorted(el)
    # determinism and text-only dependence
    out2 = _tf_expanded_rows(t)
    assert out2["tok"].to_pylist() == lists
    assert lists[0] != lists[3]


@pytest.mark.usefixtures("ray_session")
def test_matches_bruteforce():
    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(16)
    ]
    got = _run(texts, threshold=0.5)
    want = {}
    for i, j in combinations(range(len(texts)), 2):
        wj = _brute_wj(texts[i], texts[j])
        if wj >= 0.5:
            want[(i, j)] = round(wj, 6)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_repetition_separates_multiset_from_set():
    from bern_ray.functions.dedup import setsim_neardup

    base = "quick brown fox jumps over lazy dog"
    texts = [base, base + " " + base, base]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    # doubled doc vs original: every token's tf doubles -> wj = 1/2
    got = _run(texts, threshold=0.4)
    assert got[(0, 1)] == pytest.approx(0.5, abs=1e-6)
    assert got[(0, 2)] == 1.0
    # the SET measure (1-token shingles would be needed for a strict
    # comparison; 3-token shingle sets of base and base+base differ
    # only by the 2 seam shingles) cannot see the doubling:
    ss = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in setsim_neardup(ds, threshold=0.4).take_all()
    }
    assert ss[(0, 1)] > 0.7  # set view: nearly identical
    assert got[(0, 1)] == pytest.approx(0.5, abs=1e-6)  # multiset: half


# ------------------------------------------------ ICWS weighted minhash


def test_icws_estimator_accuracy():
    """Per-sample collision probability == weighted Jaccard (Ioffe's
    theorem), checked empirically at K = 4096 within 3 standard
    errors on hand-computable weighted sets."""
    from bern_ray.core.minhash import icws_signatures

    def sig_of(tf, K=4096):
        from hashlib import blake2b

        toks = sorted(tf)
        # stable hash (PYTHONHASHSEED-independent) so the 3-SE bound
        # is checked on one fixed draw, not re-rolled per process
        h = np.array(
            [
                int.from_bytes(
                    blake2b(t.encode(), digest_size=8).digest(), "big"
                )
                for t in toks
            ],
            dtype=np.uint64,
        )
        w = np.array([tf[t] for t in toks], dtype=np.float64)
        starts = np.array([0, len(toks)], dtype=np.int64)
        return icws_signatures(h, w, starts, num_samples=K)[0]

    cases = [
        ({"a": 1, "b": 2, "c": 3}, {"a": 1, "b": 2, "c": 3}, 1.0),
        ({"a": 2, "b": 1}, {"a": 1, "b": 1, "c": 1}, 0.5),
        ({"a": 5}, {"a": 1}, 0.2),
        ({"x": 3, "y": 4}, {"x": 3, "y": 4, "z": 1}, 0.875),
    ]
    for A, B, true_wj in cases:
        est = float((sig_of(A) == sig_of(B)).mean())
        se = np.sqrt(max(true_wj * (1 - true_wj), 1e-9) / 4096)
        assert abs(est - true_wj) <= max(3 * se, 1e-12), (A, B, est)


def test_icws_signature_determinism_and_empty():
    from bern_ray.core.minhash import icws_signatures

    h = np.array([7, 11, 13], dtype=np.uint64)
    w = np.array([1.0, 2.0, 3.0])
    starts = np.array([0, 2, 3, 3], dtype=np.int64)  # last doc empty
    s1 = icws_signatures(h, w, starts, num_samples=16)
    s2 = icws_signatures(h, w, starts, num_samples=16)
    np.testing.assert_array_equal(s1, s2)
    assert (s1[2] == 0).all()  # empty doc emits 0
    assert (s1[0] != s1[1]).any()


@pytest.mark.usefixtures("ray_session")
def test_icws_matches_exact_path():
    """LSH + exact verify == the exact prefix-filter path on a corpus
    whose near-dup pairs sit at wj >= 0.8 (detection 1-5e-8)."""
    from bern_ray.functions.dedup import icws_neardup

    rng = np.random.default_rng(37)
    vocab = [f"w{i}" for i in range(30)]
    base_docs = [
        " ".join(rng.choice(vocab, size=40)) for _ in range(12)
    ]
    texts = list(base_docs)
    for d in base_docs[:5]:  # plant near-dups: drop the last 3 tokens
        texts.append(" ".join(d.split()[:-3]))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    exact = _run(texts, threshold=0.8)
    approx = {
        (r["doc_id_a"], r["doc_id_b"]): r["wjaccard"]
        for r in icws_neardup(ds, threshold=0.8).take_all()
    }
    assert approx == exact
    assert len(exact) >= 5  # the planted pairs are in there
