"""Golden-entity survivorship (pipelines/linkage.py golden_entities):
the majority-vote fuse rule on planted clusters (frequency, ties,
cross-page url counting) and the end-to-end invariants over the
flagship sf0.001 clusters (one row per cluster, support conservation).
"""

import pyarrow as pa
import pytest

import ray.data

from bern_ray.pipelines.linkage import golden_entities


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "cluster_id": pa.array([r[0] for r in rows], pa.string()),
                "etype": pa.array([r[1] for r in rows], pa.string()),
                "surface": pa.array([r[2] for r in rows], pa.string()),
                "url": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


@pytest.mark.usefixtures("ray_session")
def test_majority_vote_and_ties():
    rows = [
        # cluster A: 'Alpha' x2 beats 'alpha' x1; 2 urls, 3 mentions
        ("A", "gene", "Alpha", "u1"),
        ("A", "gene", "Alpha", "u1"),
        ("A", "gene", "alpha", "u2"),
        # cluster B: tie 1-1 -> lexicographically smallest surface
        ("B", "drug", "zeta", "u1"),
        ("B", "drug", "Beta", "u2"),
    ]
    out = {
        r["cluster_id"]: r for r in golden_entities(_ds(rows)).take_all()
    }
    assert out["A"]["canonical_surface"] == "Alpha"
    assert out["A"]["n_mentions"] == 3
    assert out["A"]["n_urls"] == 2
    assert out["A"]["etype"] == "gene"
    assert out["B"]["canonical_surface"] == "Beta"  # tie -> lexicographic
    assert out["B"]["n_mentions"] == 2 and out["B"]["n_urls"] == 2


@pytest.mark.usefixtures("ray_session")
def test_flagship_invariants():
    from bern_ray.pipelines.linkage import linkage_pipeline

    clusters = linkage_pipeline("/root/testdata/sf0.001").materialize()
    golden = golden_entities(clusters).take_all()
    n_mentions = clusters.count()
    cluster_ids = set(
        r["cluster_id"]
        for r in clusters.select_columns(["cluster_id"]).take_all()
    )
    # one golden row per cluster; support sums back to the mentions
    assert len(golden) == len(cluster_ids)
    assert {r["cluster_id"] for r in golden} == cluster_ids
    assert sum(r["n_mentions"] for r in golden) == n_mentions
    assert all(r["n_urls"] >= 1 for r in golden)
    assert all(r["canonical_surface"] for r in golden)
