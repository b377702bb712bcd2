"""Similarity search over the `embeddings` table.

- `ann_topk`     : brute-force cosine top-k — per-batch matmul against
  a broadcast query matrix (`ray.put` once, read per actor/task), then
  per-batch PARTIAL top-k, then a tiny global top-k per query. Exact;
  the DuckDB `list_cosine_similarity` oracle agrees bit-for-bit after
  rounding.
- `ann_lsh_topk` : random-hyperplane LSH bucketed variant — the
  10^12-row scale path: each vector lands in one bucket per table;
  queries probe their own bucket (+ multi-probe by flipping the
  lowest-margin bits). Approximate; recall measured in tests.

Both compute in float64; the DuckDB oracles must cast their
list<float> embeddings to DOUBLE[] to agree (float32 similarity
differs in the 6th decimal and flips top-k boundary rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum


def _mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    M = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    return ids, M


def _norm(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def ann_topk(
    embs: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """-> (query_id, vec_id, cos_sim) with exactly k rows per query.

    Ties broken by ascending vec_id (deterministic, matches the SQL
    ORDER BY cos_sim DESC, vec_id).
    """
    Q = _norm(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((Q, qids))

    def partial_topk(t: pa.Table) -> pa.Table:
        Qm, qi = ray.get(ref)
        ids, M = _mat(t)
        Mn = _norm(M)
        S = Qm @ Mn.T  # (nq, batch)
        if exclude_self:
            mask = qi[:, None] == ids[None, :]
            S = np.where(mask, -np.inf, S)
        nq, nb = S.shape
        kk = min(k, nb)
        # partial top-k per query within this batch
        idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = idx.ravel()
        sims = S[rows, cols]
        keep = np.isfinite(sims)
        return pa.table(
            {
                "query_id": pa.array(qi[rows][keep], type=pa.int64()),
                "vec_id": pa.array(ids[cols][keep], type=pa.int64()),
                "cos_sim": pa.array(sims[keep], type=pa.float64()),
            }
        )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g["cos_sim"] = g["cos_sim"].round(6)
        return g

    partial = embs.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=8192
    )
    return partial.groupby("query_id").map_groups(
        global_topk, batch_format="pandas"
    )


def hyperplane_bucket(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per row (random-hyperplane LSH)."""
    bits = (M @ planes.T) >= 0
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)
    return (bits * weights[None, :]).sum(axis=1).astype(np.int64)


def ann_lsh_topk(
    embs: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> "ray.data.Dataset":
    """Approximate top-k: only vectors whose hyperplane bucket matches
    one of the query's probed buckets are scored. Scale path: the
    bucket column becomes the partition key; each query touches
    n_probes/2^n_planes of the data instead of all of it.
    """
    Q = _norm(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    d = dim or Q.shape[1]
    rs = np.random.RandomState(seed)
    planes = rs.standard_normal((n_planes, d))
    # multi-probe: query bucket + buckets with the lowest-margin bits flipped
    margins = Q @ planes.T
    base = hyperplane_bucket(Q, planes)
    probe_sets = []
    for qi in range(len(Q)):
        order = np.argsort(np.abs(margins[qi]))
        buckets = {int(base[qi])}
        for bit in order[: max(n_probes - 1, 0)]:
            buckets.add(int(base[qi]) ^ (1 << int(bit)))
        probe_sets.append(buckets)
    ref = ray.put((Q, qids, planes, probe_sets))

    def partial_topk(t: pa.Table) -> pa.Table:
        Qm, qi, pl, probes = ray.get(ref)
        ids, M = _mat(t)
        Mn = _norm(M)
        vb = hyperplane_bucket(Mn, pl)
        out_q, out_v, out_s = [], [], []
        for i in range(len(Qm)):
            sel = np.fromiter(
                (b in probes[i] for b in vb), dtype=bool, count=len(vb)
            )
            sel &= ids != qi[i]
            if not sel.any():
                continue
            sims = Mn[sel] @ Qm[i]
            sub_ids = ids[sel]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([int(qi[i])] * kk)
            out_v.extend(sub_ids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g["cos_sim"] = g["cos_sim"].round(6)
        return g

    partial = embs.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=8192
    )
    return partial.groupby("query_id").map_groups(
        global_topk, batch_format="pandas"
    )


def train_ivf_centroids(
    embs: "ray.data.Dataset",
    n_cells: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means (spherical, Lloyd) on a
    deterministic sample. The sample is tiny driver-side work (like
    the query matrix); assignment runs distributed. At 10^12 rows the
    sample stays O(sample_size) — train cost is scale-independent.
    """
    t = pa.concat_tables(
        embs.limit(sample_size).iter_batches(batch_format="pyarrow")
    )
    X = _norm(
        np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
    )
    rs = np.random.RandomState(seed)
    C = X[rs.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            sel = assign == c
            if sel.any():
                C[c] = X[sel].mean(axis=0)
        C = _norm(C)
    return C


def ann_ivf_topk(
    embs: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> "ray.data.Dataset":
    """IVF approximate top-k: vectors are bucketed to their nearest
    coarse centroid; each query scores only its n_probe nearest cells.

    With n_probe == n_cells the result is EXACTLY the brute-force
    top-k (every cell probed) — pytest pins that invariant; smaller
    n_probe trades recall for touching n_probe/n_cells of the data.
    Scale shape: the cell id is a partition key (same as the LSH
    variant); centroids are a broadcast O(n_cells x d) side input.
    """
    C = train_ivf_centroids(embs, n_cells=n_cells, seed=seed)
    Q = _norm(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    order = np.argsort(-(Q @ C.T), axis=1)
    probe_sets = [set(map(int, row[:n_probe])) for row in order]
    ref = ray.put((Q, qids, C, probe_sets))

    def partial_topk(t: pa.Table) -> pa.Table:
        Qm, qi, cents, probes = ray.get(ref)
        ids, M = _mat(t)
        Mn = _norm(M)
        cells = np.argmax(Mn @ cents.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for i in range(len(Qm)):
            sel = np.fromiter(
                (int(c) in probes[i] for c in cells),
                dtype=bool,
                count=len(cells),
            )
            sel &= ids != qi[i]
            if not sel.any():
                continue
            sims = Mn[sel] @ Qm[i]
            sub_ids = ids[sel]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([int(qi[i])] * kk)
            out_v.extend(sub_ids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g["cos_sim"] = g["cos_sim"].round(6)
        return g

    partial = embs.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=8192
    )
    return partial.groupby("query_id").map_groups(
        global_topk, batch_format="pandas"
    )


def centroids_by_label(embs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-label centroid — partial sums inside map_batches, then a tiny
    groupby over (label, component) partials. -> (label, n, centroid)."""

    def partials(t: pa.Table) -> pa.Table:
        ids, M = _mat(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(labels)
        rows = []
        for u in uniq:
            sel = labels == u
            rows.append((int(u), int(sel.sum()), M[sel].sum(axis=0)))
        return pa.table(
            {
                "label": pa.array([r[0] for r in rows], type=pa.int64()),
                "n": pa.array([r[1] for r in rows], type=pa.int64()),
                "vsum": pa.array(
                    [r[2].tolist() for r in rows],
                    type=pa.list_(pa.float64()),
                ),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        v = np.sum(np.stack(g["vsum"].to_numpy()), axis=0)
        return pd.DataFrame(
            {
                "label": [g["label"].iloc[0]],
                "n": [n],
                "centroid": [np.round(v / n, 6).tolist()],
            }
        )

    return (
        embs.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("label")
        .map_groups(combine, batch_format="pandas")
    )


# ------------------------------------------------- fixed-iteration k-means


def kmeans_fixed(
    ds: "ray.data.Dataset",
    k: int = 4,
    iters: int = 5,
    dist_dp: int = 9,
    cent_dp: int = 12,
) -> "ray.data.Dataset":
    """Lloyd's k-means with a FIXED iteration count and deterministic
    seeding (the k lowest-vec_id vectors), returning the final
    (vec_id, cluster) assignment.

    The iterate-on-driver pattern: centroids are MODEL PARAMETERS
    (k x dim doubles), so each round they come back to the driver and
    re-broadcast via ray.put — the data-side work per round is one
    map_batches (vectorized distance + argmin + per-cluster partial
    sums, k*dim rows per batch) and one packed-key groupby. The
    corpus never leaves the object store.

    Oracle determinism contract (shared with the recursive-CTE SQL of
    SQL_KMEANS_CLUSTERS):
    squared distances round to `dist_dp` decimals before argmin (ties
    -> lowest centroid id), per-dim centroid means round to `cent_dp`
    — so nondeterministic summation order on either side cannot flip
    an assignment or drift a mean. Clusters that lose all members
    die (both sides aggregate over assigned members only). Seeding by
    k-smallest ids uses a per-batch partial top-k, never a global
    sort.
    """
    C, cids = _kmeans_params(ds, k, iters, dist_dp, cent_dp)
    ref = ray.put((C, cids))

    def final_assign(t: pa.Table, ref=ref) -> pa.Table:
        C_, cids_ = ray.get(ref)
        ids, E = _mat(t)
        asg = _kmeans_assign(E, C_, cids_, dist_dp)
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64)),
                "cluster": pa.array(asg.astype(np.int64)),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")


def _kmeans_assign(
    E: np.ndarray, C_: np.ndarray, cids_: np.ndarray, dist_dp: int
) -> np.ndarray:
    d2 = np.round(
        ((E[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2), dist_dp
    )
    return cids_[np.argmin(d2, axis=1)]  # first index wins ties;
    # cids_ ascending => lowest cid, matching the SQL min(cid)


def _kmeans_params(
    ds: "ray.data.Dataset",
    k: int,
    iters: int,
    dist_dp: int,
    cent_dp: int,
) -> tuple[np.ndarray, np.ndarray]:
    """The Lloyd loop of kmeans_fixed, returning the final model
    parameters (C: live-centroid matrix, cids: their ids) so callers
    (final assignment, silhouette) can run their own last pass."""

    # --- deterministic seed: k lowest vec_id embeddings
    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            keep = np.argpartition(ids, k)[:k]
            t = t.take(pa.array(np.sort(keep)))
        return t.select(["vec_id", "embedding"])

    seed_rows = ds.map_batches(
        seed_partial, batch_format="pyarrow"
    ).take_all()
    seed_rows.sort(key=lambda r: r["vec_id"])
    C = np.array(
        [r["embedding"] for r in seed_rows[:k]], dtype=np.float32
    ).astype(np.float64)
    cids = np.arange(C.shape[0], dtype=np.int64)

    for _ in range(iters):
        ref = ray.put((C, cids))

        def sums_partial(t: pa.Table, ref=ref) -> pa.Table:
            C_, cids_ = ray.get(ref)
            ids, E = _mat(t)
            asg = _kmeans_assign(E, C_, cids_, dist_dp)
            u = np.unique(asg)
            rows_c, rows_d, rows_s, rows_n = [], [], [], []
            for c in u:
                sel = E[asg == c]
                rows_c.append(np.full(E.shape[1], c, dtype=np.int64))
                rows_d.append(np.arange(E.shape[1], dtype=np.int64))
                rows_s.append(sel.sum(axis=0))
                rows_n.append(
                    np.full(E.shape[1], sel.shape[0], dtype=np.int64)
                )
            cid_col = np.concatenate(rows_c)
            dim_col = np.concatenate(rows_d)
            return pa.table(
                {
                    "key": pa.array(cid_col * 100000 + dim_col),
                    "s": pa.array(np.concatenate(rows_s)),
                    "n": pa.array(np.concatenate(rows_n)),
                }
            )

        agg = (
            ds.map_batches(sums_partial, batch_format="pyarrow")
            .groupby("key")
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()  # k*dim rows: model parameters, driver-sized
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in agg:
            cid, dim = divmod(int(r["key"]), 100000)
            by_cid.setdefault(cid, {})[dim] = round(
                r["s"] / r["n"], cent_dp
            )
        cids = np.array(sorted(by_cid), dtype=np.int64)
        dim = C.shape[1]
        C = np.array(
            [[by_cid[c][d] for d in range(dim)] for c in cids],
            dtype=np.float64,
        )

    return C, cids


def pq_codes(
    ds: "ray.data.Dataset",
    dim: int,
    subspaces: int = 4,
    k: int = 4,
    iters: int = 3,
    dist_dp: int = 9,
    cent_dp: int = 12,
) -> "ray.data.Dataset":
    """Product quantization (Jégou et al. 2011): split the embedding
    into ``subspaces`` contiguous blocks, train an independent Lloyd
    codebook per block (the shared `_kmeans_params` loop on a sliced
    view of the SAME dataset), and emit each vector's code word per
    subspace — the memory-scale path for ANN (k^m effective centroids
    from m·k·(dim/m) floats; at 100 TB the codes column is what ships
    to the index, 4 bytes/vector here vs 256 floats).

    Training runs the m iterate-on-driver loops sequentially (model
    parameters are driver-sized); the final assignment is ONE
    map_batches computing all m argmins per batch. Shares the full
    kmeans determinism contract per subspace, so the oracle is m
    suffixed copies of the recursive centroid CTE joined on vec_id."""
    if dim % subspaces:
        raise ValueError("dim must divide evenly into subspaces")
    d = dim // subspaces

    def slicer(s: int):
        lo = s * d

        def fn(t: pa.Table) -> pa.Table:
            ids, E = _mat(t)
            sub = np.ascontiguousarray(E[:, lo : lo + d])
            return pa.table(
                {
                    "vec_id": pa.array(ids.astype(np.int64)),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(sub.ravel(), type=pa.float64()), d
                    ),
                }
            )

        return fn

    books = []
    for s in range(subspaces):
        sub_ds = ds.map_batches(slicer(s), batch_format="pyarrow")
        books.append(_kmeans_params(sub_ds, k, iters, dist_dp, cent_dp))
    ref = ray.put(books)

    def encode(t: pa.Table, ref=ref) -> pa.Table:
        books_ = ray.get(ref)
        ids, E = _mat(t)
        cols: dict = {"vec_id": pa.array(ids.astype(np.int64))}
        for s, (C_, cids_) in enumerate(books_):
            sub = E[:, s * d : (s + 1) * d]
            asg = _kmeans_assign(sub, C_, cids_, dist_dp)
            cols[f"code{s}"] = pa.array(asg.astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def kmeans_medoids(
    ds: "ray.data.Dataset",
    k: int = 4,
    iters: int = 5,
    dist_dp: int = 9,
    cent_dp: int = 12,
) -> "ray.data.Dataset":
    """Exact Euclidean medoid per k-means cluster: the member
    minimizing Σ_j d(i,j) — the 'golden vector' a canonicalization
    step keeps when an actual corpus row (not a synthetic mean) must
    represent the cluster. One tagged map_batches re-assigns points
    with the shared Lloyd contract, one groupby(cluster) co-locates
    members, and the in-group kernel is a single vectorized m×m
    distance matrix. SCALE CAVEAT (by design): exact medoid is O(m²)
    per cluster — right for bounded clusters (dedup/ER components);
    web-scale clusters should switch to nearest-to-centroid (identical
    under squared distance by the bias-variance identity) or a
    sampled medoid. Rounding ladder shared with the oracle: d² →9,
    per-pair dist →9, per-point sum →6, ties to lowest vec_id."""
    C, cids = _kmeans_params(ds, k, iters, dist_dp, cent_dp)
    ref = ray.put((C, cids))

    def tag(t: pa.Table, ref=ref) -> pa.Table:
        C_, cids_ = ray.get(ref)
        ids, E = _mat(t)
        asg = _kmeans_assign(E, C_, cids_, dist_dp)
        return t.select(["vec_id", "embedding"]).append_column(
            "cluster", pa.array(asg.astype(np.int64))
        )

    def medoid(g: pa.Table) -> pa.Table:
        ids, E = _mat(g)
        d2 = np.round(
            ((E[:, None, :] - E[None, :, :]) ** 2).sum(axis=2), dist_dp
        )
        D = np.round(np.sqrt(d2), 9)
        s = np.round(D.sum(axis=1), 6)
        i = np.lexsort((ids, s))[0]
        return pa.table(
            {
                "cluster": pa.array(
                    [int(g["cluster"][0].as_py())], type=pa.int64()
                ),
                "medoid_vec_id": pa.array(
                    [int(ids[i])], type=pa.int64()
                ),
                "sum_dist": pa.array([float(s[i])], type=pa.float64()),
                "n_members": pa.array([len(ids)], type=pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("cluster").map_groups(
        medoid, batch_format="pyarrow"
    )


def kmeans_silhouette(
    ds: "ray.data.Dataset",
    k: int = 4,
    iters: int = 5,
    dist_dp: int = 9,
    cent_dp: int = 12,
    sil_dp: int = 9,
    out_dp: int = 6,
) -> "ray.data.Dataset":
    """Simplified (centroid-based) silhouette per k-means cluster:
    a = point→own-centroid distance, b = nearest OTHER centroid,
    s = (b−a)/max(a,b); reported as the per-cluster mean — the O(n·k)
    cluster-quality score that replaces the O(n²) classic silhouette
    at corpus scale. Shares the full Lloyd determinism contract with
    kmeans_fixed (d² rounded to dist_dp before argmin, lowest-cid
    ties) plus per-point s rounded to sil_dp so the cluster mean
    cannot drift under partial-sum reordering; one extra map_batches
    + one k-row groupby after the shared parameter loop."""
    C, cids = _kmeans_params(ds, k, iters, dist_dp, cent_dp)
    ref = ray.put((C, cids))

    def sil_partial(t: pa.Table, ref=ref) -> pa.Table:
        C_, cids_ = ray.get(ref)
        ids, E = _mat(t)
        d2 = np.round(
            ((E[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2), dist_dp
        )
        pos = np.argmin(d2, axis=1)
        rows = np.arange(len(pos))
        a = np.sqrt(d2[rows, pos])
        masked = d2.copy()
        masked[rows, pos] = np.inf
        b = np.sqrt(masked.min(axis=1))
        s = np.round((b - a) / np.maximum(a, b), sil_dp)
        df = pd.DataFrame({"cluster": cids_[pos], "s": s})
        g = df.groupby("cluster", as_index=False).agg(
            n=("s", "size"), ssum=("s", "sum")
        )
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    agg = (
        ds.map_batches(sil_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"), Sum("ssum", alias_name="ssum"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "cluster": pc.cast(t["cluster"], pa.int64()),
                "n_points": pc.cast(t["n"], pa.int64()),
                "silhouette": pa.array(
                    np.round(
                        t["ssum"].to_numpy()
                        / t["n"].to_numpy(zero_copy_only=False),
                        out_dp,
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
