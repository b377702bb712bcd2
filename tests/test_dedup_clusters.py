"""dedup_clusters: minhash pairs -> CC -> per-doc canonical label.

The oracle gate checks value equality vs the recursive-CTE SQL; these
tests pin the semantics directly on a constructed corpus where the
expected clusters are known by hand, including a transitive chain the
pair list alone doesn't state."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def clustered(ray_session):
    import ray.data

    from bern_ray.functions.dedup import dedup_clusters

    base = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards brew strong potions under a pale winter moon near "
        "the old stone bridge by the river bend tonight"
    )
    # 0,1,2 near-identical (transitive chain via high overlap), 3-5
    # unrelated singletons
    docs = [
        (0, base),
        (1, base + " extra"),
        (2, base + " extra word"),
        (3, "completely different text about distributed batch engines "
            "processing arrow blocks with streaming backpressure for "
            "large scale training corpora every single day"),
        (4, "unrelated corpus entry describing connected component "
            "contraction over hash bucketed spanning forests with "
            "deterministic minimum label roots for verification"),
        (5, "short doc"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([s for _, s in docs], type=pa.string()),
        }
    )
    return (
        dedup_clusters(ray.data.from_arrow(t).repartition(3), threshold=0.8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )


def test_every_doc_labeled(clustered):
    assert list(clustered.index) == [0, 1, 2, 3, 4, 5]


def test_neardup_component_min_label(clustered):
    assert clustered.loc[0, "cluster_id"] == 0
    assert clustered.loc[1, "cluster_id"] == 0
    assert clustered.loc[2, "cluster_id"] == 0


def test_singletons_self_label(clustered):
    for d in (3, 4, 5):
        assert clustered.loc[d, "cluster_id"] == d
        assert bool(clustered.loc[d, "is_canonical"])


def test_canonical_flag_is_dedup_filter(clustered):
    kept = clustered[clustered.is_canonical]
    # one representative per cluster, minimum doc_id
    assert sorted(kept.index) == [0, 3, 4, 5]


def test_golden_records_survivorship(ray_session):
    """Survivorship rules on the same planted corpus: longest-text
    survivor (ties -> min doc_id), most-frequent lang (ties ->
    lexicographic min), member roll-ups; singletons fuse to
    themselves."""
    import ray.data

    from bern_ray.functions.dedup import golden_records

    base = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards brew strong potions under a pale winter moon near "
        "the old stone bridge by the river bend tonight"
    )
    docs = [
        (0, base, "en"),
        (1, base + " extra", "de"),
        (2, base + " extra word", "de"),
        (3, "completely different text about distributed batch engines "
            "processing arrow blocks with streaming backpressure for "
            "large scale training corpora every single day", "en"),
        (5, "short doc", "fr"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in docs], type=pa.int64()),
            "text": pa.array([s for _, s, _ in docs], type=pa.string()),
            "lang": pa.array([l for _, _, l in docs], type=pa.string()),
        }
    )
    out = (
        golden_records(ray.data.from_arrow(t).repartition(3), threshold=0.8)
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    assert sorted(out.index) == [0, 3, 5]
    c = out.loc[0]
    # doc 2 has the longest text -> survivor; lang mode: de x2 vs en x1
    assert c["survivor_doc_id"] == 2
    assert c["n_members"] == 3
    assert c["total_chars"] == sum(len(s) for _, s, l in docs[:3])
    assert c["lang_mode"] == "de"
    for d in (3, 5):
        s = out.loc[d]
        assert s["survivor_doc_id"] == d
        assert s["n_members"] == 1
        assert s["lang_mode"] == dict((a, c2) for a, _, c2 in docs)[d]


def test_golden_records_lang_mode_tie(ray_session):
    """Equal lang counts inside a cluster resolve to the
    lexicographically smallest lang."""
    import ray.data

    from bern_ray.functions.dedup import golden_records

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    )
    t = pa.table(
        {
            "doc_id": pa.array([10, 11], type=pa.int64()),
            "text": pa.array([base, base + " psi"], type=pa.string()),
            "lang": pa.array(["fr", "de"], type=pa.string()),
        }
    )
    out = (
        golden_records(ray.data.from_arrow(t), threshold=0.8)
        .to_pandas()
        .set_index("cluster_id")
    )
    assert list(out.index) == [10]
    assert out.loc[10, "survivor_doc_id"] == 11
    assert out.loc[10, "lang_mode"] == "de"


# ---- per-cluster cohesion over verified intra-cluster edges ----


def _brute_cohesion(docs, threshold):
    """3-gram shingle jaccard all-pairs + union-find, per-cluster
    (n_edges, min_j, mean_j) — the oracle semantics in miniature."""
    import re

    import numpy as np

    def shingles(s):
        ts = re.findall(r"[0-9a-zA-Z]+", s.lower())
        return set(
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        )

    sh = {i: shingles(s) for i, s in docs}
    parent = {i: i for i, _ in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = []
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            sa, sb = sh[a], sh[b]
            if not sa or not sb:
                continue
            if min(len(sa), len(sb)) / max(len(sa), len(sb)) < threshold:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                edges.append((a, b, round(j, 6)))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for a, b, j in edges:
        out.setdefault(find(a), []).append(j)
    return {
        c: (
            len(js),
            min(js),
            round(float(np.mean(js)), 6),
        )
        for c, js in out.items()
    }


def test_cluster_cohesion_matches_bruteforce(ray_session):
    import numpy as np
    import ray.data

    from bern_ray.functions.dedup import cluster_cohesion

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega one two three four five six seven eight nine ten"
    )
    # 0-1-2: a transitive chain (0~1 and 1~2 verify; 0~2 is looser),
    # 5-6: an identical pair, rest singletons
    docs = [
        (0, base),
        (1, base + " extra"),
        (2, base + " extra more"),
        (3, "a completely unrelated document about streaming "
            "execution with backpressure over arrow blocks in a "
            "distributed object store with deterministic spilling"),
        (5, "twin text payload shared verbatim between two rows of "
            "this corpus fixture exercising the identical pair path "
            "with jaccard exactly one end to end"),
        (6, "twin text payload shared verbatim between two rows of "
            "this corpus fixture exercising the identical pair path "
            "with jaccard exactly one end to end"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([s for _, s in docs], type=pa.string()),
        }
    )
    got = (
        cluster_cohesion(
            ray.data.from_arrow(t).repartition(3), threshold=0.8
        )
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    want = _brute_cohesion(docs, 0.8)
    assert set(got.index) == set(want)
    for c, (n, mn, mean) in want.items():
        assert got.loc[c, "n_edges"] == n
        assert got.loc[c, "min_jaccard"] == pytest.approx(mn, abs=1e-9)
        assert got.loc[c, "mean_jaccard"] == pytest.approx(
            mean, abs=1e-6
        )
    # the identical pair clusters at jaccard exactly 1.0
    assert got.loc[5, "min_jaccard"] == 1.0
