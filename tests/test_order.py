"""Global rank + sorted-neighborhood blocking (stages/order.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _make_ds(keys, ids=None):
    import ray.data

    ids = np.arange(len(keys)) if ids is None else np.asarray(ids)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "okey": pa.array(np.asarray(keys), type=pa.int64()),
            }
        )
    ).repartition(7)


def test_global_rank_matches_argsort(ray_session):
    from bern_ray.stages.order import global_rank

    rng = np.random.default_rng(5)
    keys = rng.permutation(2_000) * 3 + 11
    out = (
        global_rank(_make_ds(keys), "okey", num_buckets=8)
        .to_pandas()
        .sort_values("okey")
    )
    assert out["rank"].to_numpy().tolist() == list(range(1, 2_001))
    # rank follows the key order exactly
    joined = out.sort_values("doc_id")
    want = np.empty(len(keys), dtype=np.int64)
    want[np.argsort(keys, kind="stable")] = np.arange(1, len(keys) + 1)
    assert (joined["rank"].to_numpy() == want[joined.doc_id]).all()


def test_global_rank_skewed_keys(ray_session):
    """Heavily duplicated sample values must not break the range
    partitioning (boundaries dedupe; ties broken by the unique okey)."""
    from bern_ray.stages.order import global_rank

    # okey must be unique: pack (skewed value, row id)
    rng = np.random.default_rng(9)
    vals = np.where(rng.random(1_000) < 0.8, 7, rng.integers(0, 100, 1_000))
    okey = vals.astype(np.int64) * 100_000 + np.arange(1_000)
    out = global_rank(_make_ds(okey), "okey", num_buckets=8).to_pandas()
    got = out.sort_values("okey")["rank"].to_numpy()
    assert got.tolist() == list(range(1, 1_001))


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    from bern_ray.stages.order import sorted_neighborhood

    rng = np.random.default_rng(13)
    n, w = 500, 6
    keys = rng.permutation(n) * 10 + 3
    ids = rng.permutation(n) + 1_000
    got = (
        sorted_neighborhood(
            _make_ds(keys, ids), "okey", "doc_id", w, num_buckets=8
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # brute force: rank by key, all pairs with rank distance < w
    rank = np.empty(n, dtype=np.int64)
    rank[np.argsort(keys)] = np.arange(n)
    want = set()
    by_rank = ids[np.argsort(keys)]
    for i in range(n):
        for j in range(i + 1, min(i + w, n)):
            want.add((by_rank[i], by_rank[j]))
    assert set(zip(got.id_a, got.id_b)) == want
    assert len(got) == len(want)  # no duplicate pairs


def test_sorted_neighborhood_rejects_tiny_window(ray_session):
    from bern_ray.stages.order import sorted_neighborhood

    with pytest.raises(ValueError):
        sorted_neighborhood(_make_ds([1, 2]), "okey", "doc_id", 1)


# ---- multi-pass SNM: union of windows over two sort keys ----


def test_snm_multipass_second_key_catches(ray_session, tmp_path):
    """Two zh docs sit at opposite ends of the length order (pass 1
    cannot window them together across the en crowd) but are adjacent
    in the (lang, n_chars) order — the multi-pass union must contain
    their pair, and must equal the brute-force two-window union."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bern_ray.pipelines.relational import (
        SQL_SNM_MULTIPASS,
        q_snm_multipass,
    )

    n_en = 30
    rows = [(i, "x" * (10 + i), "en") for i in range(n_en)]
    rows.append((100, "z" * 5, "zh"))      # shortest doc overall
    rows.append((101, "z" * 200, "zh"))    # longest doc overall
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
            "source": pa.array(["s"] * len(rows), type=pa.string()),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], type=pa.int64()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = {
        (int(r.id_a), int(r.id_b))
        for r in q_snm_multipass(str(tmp_path))
        .to_pandas()
        .itertuples()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    want = {
        (a, b)
        for a, b in con.execute(SQL_SNM_MULTIPASS).fetchall()
    }
    assert got == want
    assert (100, 101) in got  # only pass 2 can produce this pair


def test_progressive_schedule_is_permutation(ray_session):
    """with_ranks=True emits exact global ranks, and the progressive
    closed-form priority ((d-1)N - d(d-1)/2 + rank_a) is a
    permutation of 1..n_pairs ordered by (dist, rank_a) — the PSNM
    schedule invariant."""
    from bern_ray.stages.order import sorted_neighborhood

    rng = np.random.default_rng(3)
    n, w = 300, 5
    keys = rng.permutation(n) * 7 + 1
    ids = rng.permutation(n) + 500
    df = sorted_neighborhood(
        _make_ds(keys, ids),
        "okey",
        "doc_id",
        w,
        num_buckets=8,
        with_ranks=True,
    ).to_pandas()
    d = df.rank_b - df.rank_a
    assert ((d >= 1) & (d < w)).all()
    prio = (d - 1) * n - d * (d - 1) // 2 + df.rank_a
    assert sorted(prio) == list(range(1, len(df) + 1))
    # schedule order == (dist, rank_a) lexicographic order
    sched = df.assign(prio=prio).sort_values("prio")
    assert (sched.rank_b - sched.rank_a).is_monotonic_increasing or (
        sorted(
            zip(sched.rank_b - sched.rank_a, sched.rank_a)
        )
        == list(zip(sched.rank_b - sched.rank_a, sched.rank_a))
    )
    # round boundaries: exactly n - dist pairs per distance
    counts = d.value_counts().to_dict()
    assert counts == {dist: n - dist for dist in range(1, w)}


def test_adaptive_snm_matches_bruteforce(ray_session):
    """Gaps-and-islands pair emission vs a sequential reference,
    with num_buckets > islands so islands MUST span range-bucket
    boundaries, plus the purge counter."""
    from bern_ray.stages.order import adaptive_snm
    from bern_ray.state import counters

    rng = np.random.default_rng(13)
    # keys in clumps separated by big gaps; one clump oversized
    keys = np.concatenate(
        [
            100 + np.arange(6),          # island of 6
            200 + np.arange(0, 8, 2),    # island of 4 (gap 2 = phi)
            300 + np.arange(15),         # island of 15 -> purged
            400 + np.array([0]),         # singleton
            500 + np.array([0, 1, 5]),   # islands {0,1} and {5}... gap 4 > 2
        ]
    ).astype(np.int64)
    ids = (rng.permutation(len(keys)) + 1000).astype(np.int64)
    phi, cap = 2, 10

    # sequential reference
    order = np.lexsort((ids, keys))
    sk, si = keys[order], ids[order]
    brk = np.zeros(len(sk), dtype=np.int64)
    brk[1:] = (np.diff(sk) > phi).astype(np.int64)
    island = np.cumsum(brk)
    want = set()
    for isl in np.unique(island):
        members = sorted(si[island == isl].tolist())
        if 2 <= len(members) <= cap:
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    want.add((members[x], members[y], int(isl)))

    counters.reset()
    ds = _make_ds(keys, ids)
    df = adaptive_snm(
        ds, "okey", "doc_id", phi=phi, max_island=cap, num_buckets=16
    ).to_pandas()
    got = {
        (int(a), int(b), int(i))
        for a, b, i in zip(df.id_a, df.id_b, df.island)
    }
    assert got == want
    snap = counters.snapshot()
    assert snap.get("adaptive_snm_purged_islands", 0) == 1
    assert snap.get("adaptive_snm_purged_pairs", 0) == 15 * 14 // 2
