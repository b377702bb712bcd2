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
