"""ANN: brute-force exactness vs numpy; LSH recall vs brute force."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _load():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    M = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def test_ann_topk_exact(ray_session):
    import ray.data

    from bern_ray.functions.ann import ann_topk

    ids, M = _load()
    Q, qids = M[:3], ids[:3]
    got = (
        ann_topk(
            ray.data.read_parquet(f"{SF}/embeddings.parquet"), Q, qids, k=5
        )
        .to_pandas()
        .sort_values(["query_id", "cos_sim", "vec_id"],
                     ascending=[True, False, True])
    )
    for qi in range(3):
        sims = M @ Q[qi]
        sims[ids == qids[qi]] = -np.inf
        order = np.lexsort((ids, -sims))[:5]
        exp_ids = ids[order].tolist()
        g = got[got.query_id == qids[qi]]
        assert g.vec_id.tolist() == exp_ids
        assert np.allclose(g.cos_sim.values, np.round(sims[order], 6))


def test_ann_lsh_finds_near_identical(ray_session):
    """Random-hyperplane LSH guarantees recall for HIGH-similarity
    neighbors (bucket-match prob -> 1 as cos -> 1); the synthetic
    embeddings are near-orthogonal (max pair cos ~0.5), where any LSH
    legitimately prunes. So the recall property is tested on planted
    near-identical queries: each query IS a stored vector (fresh
    query_id, no self-exclusion) and LSH must return it at rank 1."""
    import ray.data

    from bern_ray.functions.ann import ann_lsh_topk

    ids, M = _load()
    Q = M[:5]
    qids = np.array([-1, -2, -3, -4, -5], dtype=np.int64)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    approx = ann_lsh_topk(ds, Q, qids, k=10, n_probes=6).to_pandas()
    for i, q in enumerate(qids):
        g = approx[approx.query_id == q].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert len(g) >= 1, f"query {q} found nothing"
        assert g.vec_id.iloc[0] == ids[i]
        assert g.cos_sim.iloc[0] > 0.999999
    assert (approx.groupby("query_id").size() <= 10).all()


def test_centroids_match_numpy(ray_session):
    import ray.data

    from bern_ray.functions.ann import centroids_by_label

    t = pq.read_table(f"{SF}/embeddings.parquet")
    labels = t["label"].to_numpy(zero_copy_only=False)
    M = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    got = centroids_by_label(
        ray.data.read_parquet(f"{SF}/embeddings.parquet")
    ).to_pandas()
    for _, row in got.iterrows():
        sel = labels == row.label
        exp = np.round(M[sel].mean(axis=0), 6)
        assert row.n == sel.sum()
        assert np.allclose(np.array(row.centroid), exp, atol=1e-6)


def test_ivf_full_probe_equals_brute_force(ray_session):
    """n_probe == n_cells probes every cell -> must equal the exact
    brute-force top-k bit for bit."""
    import ray.data

    from bern_ray.functions.ann import ann_ivf_topk, ann_topk
    from bern_ray.pipelines.relational import _query_vectors

    sf = "/root/testdata/sf0.001"
    embs = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    Q, qids = _query_vectors(sf)
    exact = (
        ann_topk(embs, Q, qids, k=10)
        .to_pandas()
        .sort_values(["query_id", "cos_sim", "vec_id"])
        .reset_index(drop=True)
    )
    ivf = (
        ann_ivf_topk(
            ray.data.read_parquet(f"{sf}/embeddings.parquet"),
            Q,
            qids,
            k=10,
            n_cells=8,
            n_probe=8,
        )
        .to_pandas()
        .sort_values(["query_id", "cos_sim", "vec_id"])
        .reset_index(drop=True)
    )
    assert exact[["query_id", "vec_id"]].equals(ivf[["query_id", "vec_id"]])
    assert (exact["cos_sim"] - ivf["cos_sim"]).abs().max() < 1e-12


def test_ivf_partial_probe_recall(ray_session):
    """Probing half the cells must recover a meaningful fraction of
    the exact top-10 (lower bound loose: synthetic embeddings are
    near-orthogonal, so recall ~ fraction of cells probed)."""
    import ray.data

    from bern_ray.functions.ann import ann_ivf_topk, ann_topk
    from bern_ray.pipelines.relational import _query_vectors

    sf = "/root/testdata/sf0.001"
    embs = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    Q, qids = _query_vectors(sf)
    exact = ann_topk(embs, Q, qids, k=10).to_pandas()
    approx = ann_ivf_topk(
        ray.data.read_parquet(f"{sf}/embeddings.parquet"),
        Q,
        qids,
        k=10,
        n_cells=8,
        n_probe=4,
    ).to_pandas()
    got = set(map(tuple, approx[["query_id", "vec_id"]].values))
    want = set(map(tuple, exact[["query_id", "vec_id"]].values))
    recall = len(got & want) / len(want)
    assert recall >= 0.25, recall
