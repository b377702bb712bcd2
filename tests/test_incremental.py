"""Incremental linkage: merging a new page batch into prior state must
produce exactly the clusters of a from-scratch run over the union —
while extracting/scoring only new-touching work."""

import pyarrow as pa
import pytest

import ray.data

from bern_ray.sources.pages import pages_table

SF = "/root/testdata/sf0.001"


def _norm_and_score(pages_ds):
    from bern_ray.pipelines.linkage import (
        extract_normalize_mentions,
        score_pairs,
    )
    from bern_ray.stages.blocking import candidate_pairs

    norm = extract_normalize_mentions(
        pages_ds, concurrency=(1, 2)
    ).materialize()
    scored = score_pairs(
        candidate_pairs(norm, dedup=False, with_attrs=True),
        None,
        concurrency=(1, 2),
    ).materialize()
    return norm, scored


@pytest.fixture(scope="module")
def split_pages(ray_session):
    t = pages_table(SF)
    prior = ray.data.from_arrow(t.slice(0, 400)).repartition(4)
    new = ray.data.from_arrow(t.slice(400)).repartition(2)
    full = ray.data.from_arrow(t).repartition(4)
    return prior, new, full


def test_incremental_equals_full_batch(split_pages):
    from bern_ray.pipelines.linkage import (
        cluster_mentions,
        incremental_linkage,
    )
    from bern_ray.stages.scoring import edges_only

    prior_pages, new_pages, full_pages = split_pages

    norm_full, scored_full = _norm_and_score(full_pages)
    full_clusters = cluster_mentions(
        norm_full,
        scored_full.map_batches(edges_only, batch_format="pyarrow"),
    ).to_pandas()

    norm_prior, scored_prior = _norm_and_score(prior_pages)
    incr_clusters = incremental_linkage(
        norm_prior, scored_prior, new_pages, concurrency=(1, 2)
    ).to_pandas()

    key = ["url", "mention_id"]
    a = (
        full_clusters[key + ["cluster_id"]]
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        incr_clusters[key + ["cluster_id"]]
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert a.equals(b)


def test_incremental_scores_only_new_touching_pairs(split_pages):
    """The efficiency claim itself: pair generation in incremental
    mode emits strictly fewer pairs than the full run, and every
    emitted pair touches a new mention."""
    from bern_ray.pipelines.linkage import extract_normalize_mentions
    from bern_ray.stages.blocking import candidate_pairs

    prior_pages, new_pages, full_pages = split_pages

    def flag(val):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "is_new", pa.array([val] * t.num_rows, type=pa.bool_())
            )

        return fn

    norm_prior = extract_normalize_mentions(
        prior_pages, concurrency=(1, 2)
    ).map_batches(flag(False), batch_format="pyarrow")
    norm_new = extract_normalize_mentions(
        new_pages, concurrency=(1, 2)
    ).map_batches(flag(True), batch_format="pyarrow")
    tagged = norm_prior.union(norm_new).materialize()

    new_mids = set()
    for bt in tagged.iter_batches(batch_format="pyarrow"):
        for m, n in zip(
            bt["mention_id"].to_pylist(), bt["is_new"].to_pylist()
        ):
            if n:
                new_mids.add(m)

    incr_pairs = candidate_pairs(
        tagged, dedup=False, with_attrs=True
    ).to_pandas()
    full_pairs = candidate_pairs(
        tagged.drop_columns(["is_new"]).materialize(),
        dedup=False,
        with_attrs=True,
    ).to_pandas()
    assert 0 < len(incr_pairs) < len(full_pairs)
    touches_new = incr_pairs.apply(
        lambda r: r.a_mid in new_mids or r.b_mid in new_mids, axis=1
    )
    assert touches_new.all()


def test_incremental_exploded_key_checkpoint(split_pages, tmp_path):
    """With a checkpoint_root, the prior corpus's exploded blocking
    keys are persisted on the first increment and READ BACK on the
    next — the prior mentions are never re-exploded (manifest is
    untouched by the second run) and clusters still equal the
    from-scratch result."""
    import os

    from bern_ray.pipelines.linkage import (
        cluster_mentions,
        incremental_linkage,
    )
    from bern_ray.state.checkpoint import manifest_path
    from bern_ray.stages.scoring import edges_only

    prior_pages, new_pages, full_pages = split_pages
    root = str(tmp_path / "ckpt")

    norm_full, scored_full = _norm_and_score(full_pages)
    full_clusters = cluster_mentions(
        norm_full,
        scored_full.map_batches(edges_only, batch_format="pyarrow"),
    ).to_pandas()

    norm_prior, scored_prior = _norm_and_score(prior_pages)
    r1 = incremental_linkage(
        norm_prior, scored_prior, new_pages,
        concurrency=(1, 2), checkpoint_root=root,
    ).to_pandas()
    mpath = manifest_path(root, "exploded_prior")
    assert os.path.exists(mpath)
    stamp = os.stat(mpath).st_mtime_ns

    # second increment over the same prior state: checkpoint is reused
    r2 = incremental_linkage(
        norm_prior, scored_prior, new_pages,
        concurrency=(1, 2), checkpoint_root=root,
    ).to_pandas()
    assert os.stat(mpath).st_mtime_ns == stamp  # factory did NOT rerun

    key = ["url", "mention_id"]
    want = (
        full_clusters[key + ["cluster_id"]]
        .sort_values(key)
        .reset_index(drop=True)
    )
    for got in (r1, r2):
        g = (
            got[key + ["cluster_id"]]
            .sort_values(key)
            .reset_index(drop=True)
        )
        assert g.equals(want)
