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
