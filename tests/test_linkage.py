"""End-to-end linkage correctness: pairwise F1 >= 0.99 on labeled
same-block pairs + golden cluster comparison (FIXTURES.md §6 items
3-4; BASELINE.md target metrics).

Ground truth is derived from the page synthesizer's planted mentions:
two mentions are positive iff the reference semantics (dictionary
fold/fallback chain + oid_merge transitive closure) give them the same
canonical ID — exactly the reference's normalization fixtures
re-expressed as linkage pairs (utils.py:155-265 analog).
"""

import itertools

import pytest

from bern_ray.core.fold import fold_text_str
from bern_ray.sources import dicts
from bern_ray.sources.pages import planted_mentions, url_of

SF = "/root/testdata/sf0.001"
N_DOCS = 500


@pytest.fixture(scope="module")
def clusters_df(ray_session):
    from bern_ray.pipelines.linkage import linkage_pipeline

    return linkage_pipeline(SF, concurrency=(1, 2)).to_pandas()


@pytest.fixture(scope="module")
def truth():
    """(url, folded_surface) -> canonical ground-truth oid."""
    closure = dicts.merge_closure(dicts.build_oid_merge())
    out = {}
    for doc_id in range(N_DOCS):
        for idx, surf in planted_mentions(doc_id):
            canon = closure.get(dicts.oid_of(idx), dicts.oid_of(idx))
            out[(url_of(doc_id), fold_text_str(surf))] = canon
    return out


def _mention_cluster_map(clusters_df):
    return {
        (r.url, r.surface): r.cluster_id
        for r in clusters_df.itertuples()
    }


def test_every_planted_mention_clustered_to_canonical(clusters_df, truth):
    got = _mention_cluster_map(clusters_df)
    wrong = []
    for (url, surf), canon in truth.items():
        cid = got.get((url, surf))
        if cid != f"BERN:{canon}":
            wrong.append((url, surf, canon, cid))
    assert not wrong, wrong[:10]


def test_pairwise_f1(clusters_df, truth):
    """Pairwise P/R/F1 over labeled pairs sharing a blocking key.

    Positives: same canonical oid (all such pairs share the 'O:<oid>'
    block). Negatives: different canonical oids drawn from adjacent
    dictionary indices (similar surfaces -> frequently share LSH
    bands) plus random cross pairs.
    """
    got = _mention_cluster_map(clusters_df)
    by_canon = {}
    for key, canon in truth.items():
        by_canon.setdefault(canon, []).append(key)

    tp = fp = fn = tn = 0
    # positive labeled pairs (cap per canon for test runtime)
    for canon, keys in by_canon.items():
        for a, b in itertools.islice(itertools.combinations(keys, 2), 50):
            if got.get(a) == got.get(b) and got.get(a) is not None:
                tp += 1
            else:
                fn += 1
    # negative labeled pairs: adjacent canon ids (same etype = step 7)
    canons = sorted(by_canon)
    rngpairs = zip(canons, canons[1:])
    for c1, c2 in rngpairs:
        for a in by_canon[c1][:5]:
            for b in by_canon[c2][:5]:
                if got.get(a) == got.get(b) and got.get(a) is not None:
                    fp += 1
                else:
                    tn += 1
    assert tp + fn > 500, "not enough positive labeled pairs"
    assert fp + tn > 500, "not enough negative labeled pairs"
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    assert f1 >= 0.99, (precision, recall, f1)


def test_merge_chain_transitive(clusters_df):
    """Mentions normalized to oid i, i-7, i-14 (a goid2goid chain) must
    share one cluster — the transitive-closure requirement."""
    df = clusters_df.dropna(subset=["oid"])
    for i in range(14, dicts.N_OIDS, 21):
        oids = {dicts.oid_of(i - 14), dicts.oid_of(i - 7), dicts.oid_of(i)}
        sub = df[df.oid.isin({dicts.oid_of(i - 14)})]
        if sub.empty:
            continue
        # the pipeline rewrites member oids to the canonical root
        assert set(sub.cluster_id) == {f"BERN:{dicts.oid_of(i - 14)}"}


def test_lp_mode_identical_clusters(clusters_df, ray_session):
    """cc_mode='lp' runs CC + label attach as pure Dataset ops (no
    driver label dict); its cluster assignment must be identical to
    the union-find path because cluster_id is derived from component
    CONTENT (min oid / shared fold key), not from root node ids."""
    from bern_ray.pipelines.linkage import linkage_pipeline

    lp = linkage_pipeline(SF, cc_mode="lp", concurrency=(1, 2)).to_pandas()
    key = ["url", "mention_id"]
    a = clusters_df[key + ["cluster_id"]].sort_values(key).reset_index(
        drop=True
    )
    b = lp[key + ["cluster_id"]].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_cluster_ids_consistent(clusters_df):
    df = clusters_df.dropna(subset=["oid"])
    assert (df.groupby("oid").cluster_id.nunique() <= 1).all()
    assert (df.groupby("cluster_id").oid.nunique() <= 1).all()
