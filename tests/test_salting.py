"""Hot-key salting correctness: with a tiny salt threshold every
primary block is split into sub-blocks, and the pivot-link pass must
still keep same-oid mentions in ONE cluster (north_rule skew
requirement)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clusters_salted(ray_session):
    from bern_ray.pipelines.linkage import linkage_pipeline

    # salt_threshold=20 forces salting of every block with >20 members
    return linkage_pipeline(
        SF, salt_threshold=20, concurrency=(1, 2)
    ).to_pandas()


def test_salting_preserves_clusters(clusters_salted):
    from bern_ray.pipelines.linkage import linkage_pipeline

    df = clusters_salted.dropna(subset=["oid"])
    # same oid -> exactly one cluster, even though its block was salted
    assert (df.groupby("oid").cluster_id.nunique() <= 1).all()
    assert (df.groupby("cluster_id").oid.nunique() <= 1).all()


def test_salting_matches_unsalted(ray_session, clusters_salted):
    from bern_ray.pipelines.linkage import linkage_pipeline

    unsalted = linkage_pipeline(
        SF, salt_threshold=10**9, concurrency=(1, 2)
    ).to_pandas()
    a = clusters_salted.set_index("mention_id").cluster_id
    b = unsalted.set_index("mention_id").cluster_id
    common = a.index.intersection(b.index)
    assert len(common) == len(a) == len(b)
    assert (a.loc[common] == b.loc[common]).all()


def test_lsh_only_pairs_never_link():
    """Premise of the LSH star+chain cap (stages/blocking.py): a pair
    NOT sharing a primary block (different oids / different folds)
    cannot cross the edge threshold, so LSH-band spanning topology is
    lossless under the frozen ensemble."""
    import pyarrow as pa

    from bern_ray.stages.scoring import EDGE_THRESHOLD, PairScorer

    batch = pa.table(
        {
            "a_mid": pa.array([1, 3], type=pa.int64()),
            "b_mid": pa.array([2, 4], type=pa.int64()),
            # near-identical surfaces (max string sim) but different
            # folds / oids — the strongest possible LSH-only pair
            "a_surface": pa.array(["zorvaxqin7", "abc def"]),
            "b_surface": pa.array(["zorvaxqin9", "abc defg"]),
            "a_oid": pa.array(["GN:000001", None], type=pa.string()),
            "b_oid": pa.array(["GN:000002", None], type=pa.string()),
            "block_key": pa.array(["k", "k"]),
        }
    )
    out = PairScorer()(batch)
    assert not any(out["is_edge"].to_pylist())
    assert max(out["score"].to_pylist()) < EDGE_THRESHOLD
