"""Fixed-iteration k-means vs a dense numpy Lloyd reference."""

import numpy as np
import pandas as pd

from bern_ray.functions.ann import kmeans_fixed


def _lloyd_reference(vid, E, k, iters, dist_dp=9, cent_dp=12):
    order = np.argsort(vid, kind="stable")
    vid, E = vid[order], E[order]
    C = E[:k].copy()
    cids = np.arange(k)
    for _ in range(iters):
        d2 = np.round(((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), dist_dp)
        asg = cids[np.argmin(d2, axis=1)]
        newC, newcids = [], []
        for c in sorted(set(asg)):
            newC.append(np.round(E[asg == c].mean(axis=0), cent_dp))
            newcids.append(c)
        C, cids = np.vstack(newC), np.array(newcids)
    d2 = np.round(((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), dist_dp)
    return dict(zip(vid.tolist(), cids[np.argmin(d2, axis=1)].tolist()))


def test_kmeans_fixed_vs_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    # three planted gaussian blobs + a stray singleton
    centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0] * 8])
    pts = np.vstack(
        [c + rng.normal(0, 1.0, size=(40, 8)) for c in centers]
        + [np.full((1, 8), 100.0)]
    ).astype(np.float32)
    vid = np.arange(len(pts))
    df = pd.DataFrame(
        {"vec_id": vid, "embedding": [row.tolist() for row in pts]}
    )
    ds = ray.data.from_pandas(df).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    got = (
        kmeans_fixed(ds, k=4, iters=5)
        .to_pandas()
        .set_index("vec_id")["cluster"]
        .to_dict()
    )
    exp = _lloyd_reference(vid, pts.astype(np.float64), k=4, iters=5)
    assert got == exp
    # far-apart blobs never share a cluster (a blob MAY split — all
    # four seeds start inside blob 0 by the lowest-id rule)
    lab = pd.Series(got)
    sets = [
        set(lab.loc[list(blob)])
        for blob in (range(40), range(40, 80), range(80, 120))
    ]
    assert not (sets[0] & sets[1]) and not (sets[1] & sets[2])
    assert not (sets[0] & sets[2])


def test_kmeans_medoids_planted(ray_session):
    import ray.data

    from bern_ray.functions.ann import kmeans_medoids

    rng = np.random.default_rng(23)
    centers = np.array([[0.0] * 6, [50.0] * 6])
    pts = np.vstack(
        [c + rng.normal(0, 1.0, size=(25, 6)) for c in centers]
    ).astype(np.float32)
    vid = np.arange(len(pts))
    df = pd.DataFrame(
        {"vec_id": vid, "embedding": [row.tolist() for row in pts]}
    )
    ds = ray.data.from_pandas(df).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    out = kmeans_medoids(ds, k=2, iters=5).to_pandas()
    assert out.n_members.sum() == len(pts)
    # brute-force medoid per reported cluster over the same fit
    from bern_ray.functions.ann import _kmeans_assign, _kmeans_params

    C, cids = _kmeans_params(ds, 2, 5, 9, 12)
    E = pts.astype(np.float64)
    asg = _kmeans_assign(E, C, cids, 9)
    for r in out.itertuples():
        mem = np.flatnonzero(asg == r.cluster)
        sub = E[mem]
        d2 = np.round(
            ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(axis=2), 9
        )
        s = np.round(np.round(np.sqrt(d2), 9).sum(axis=1), 6)
        best = mem[np.lexsort((vid[mem], s))[0]]
        assert r.medoid_vec_id == vid[best]
        assert abs(r.sum_dist - s.min()) < 1e-9
        assert r.n_members == len(mem)


def test_pq_codes_equal_per_subspace_kmeans(ray_session):
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.ann import (
        _kmeans_assign,
        _kmeans_params,
        pq_codes,
    )

    rng = np.random.default_rng(31)
    pts = rng.normal(0, 5, size=(60, 8)).astype(np.float32)
    vid = np.arange(len(pts))
    df = pd.DataFrame(
        {"vec_id": vid, "embedding": [row.tolist() for row in pts]}
    )
    ds = ray.data.from_pandas(df).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    out = (
        pq_codes(ds, dim=8, subspaces=2, k=3, iters=4)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    E = pts.astype(np.float64)
    for s in range(2):
        sub = np.ascontiguousarray(E[:, s * 4 : (s + 1) * 4])
        sdf = pd.DataFrame(
            {"vec_id": vid, "embedding": [r.tolist() for r in sub]}
        )
        sds = ray.data.from_pandas(sdf).map_batches(
            lambda t: t.replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        C, cids = _kmeans_params(sds, 3, 4, 9, 12)
        exp = _kmeans_assign(sub, C, cids, 9)
        assert (out[f"code{s}"].to_numpy() == exp).all()
