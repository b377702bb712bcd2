"""HyperLogLog sketch: estimate accuracy vs exact, merge semantics."""

import numpy as np
import pyarrow as pa


def test_estimate_within_error_bound():
    """Driver-side kernel check: p=10 standard error is ~3.3%; assert
    within 4 sigma across two decades of cardinality."""
    from bern_ray.functions.sketch import _fold, _registers, _splitmix64, estimate

    rng = np.random.default_rng(7)
    for true_n in (100, 5_000, 200_000):
        keys = rng.choice(true_n * 10, size=true_n, replace=False).astype(
            np.int64
        )
        # duplicates must not change the estimate (max is idempotent)
        keys = np.concatenate([keys, keys[: true_n // 2]])
        h = _splitmix64(keys)
        idx, rho = _registers(h, p=10)
        est = estimate(_fold(idx, rho, 1024), p=10)
        assert abs(est - true_n) / true_n < 0.14, (true_n, est)


def test_merge_equals_union():
    from bern_ray.functions.sketch import (
        _fold,
        _registers,
        _splitmix64,
        estimate,
        merge_registers,
    )

    a = np.arange(0, 3000, dtype=np.int64)
    b = np.arange(1500, 6000, dtype=np.int64)  # overlapping
    sketches = []
    for keys in (a, b):
        idx, rho = _registers(_splitmix64(keys), p=10)
        sketches.append(_fold(idx, rho, 1024))
    idx, rho = _registers(_splitmix64(np.union1d(a, b)), p=10)
    direct = _fold(idx, rho, 1024)
    merged = merge_registers(sketches, p=10)
    assert merged == direct  # register-exact, not just estimate-close
    assert abs(estimate(merged, p=10) - 6000) / 6000 < 0.14


def test_hll_distinct_dataset_vs_exact(ray_session):
    """Distributed path: per-batch partials + groupby merge must agree
    with the exact per-group distinct count within the error bound,
    independent of how rows are batched."""
    import ray.data

    from bern_ray.functions.sketch import hll_distinct

    rng = np.random.default_rng(11)
    groups = np.array(["a", "b", "c"])[rng.integers(0, 3, size=30_000)]
    # distinct cardinality differs per group
    keys = np.where(
        groups == "a",
        rng.integers(0, 500, size=30_000),
        np.where(
            groups == "b",
            rng.integers(0, 4_000, size=30_000),
            rng.integers(0, 20_000, size=30_000),
        ),
    ).astype(np.int64)
    t = pa.table({"g": groups, "k": keys})
    exact = {
        g: len(np.unique(keys[groups == g])) for g in ("a", "b", "c")
    }
    ds = ray.data.from_arrow(t).repartition(8)
    out = hll_distinct(ds, key="k", group="g").to_pandas()
    assert set(out["g"]) == {"a", "b", "c"}
    for _, row in out.iterrows():
        e = exact[row["g"]]
        assert abs(row["n_distinct"] - e) / e < 0.14, (row["g"], e, row)


def test_string_keys(ray_session):
    import ray.data

    from bern_ray.functions.sketch import hll_distinct

    t = pa.table(
        {
            "g": ["x"] * 1000,
            "k": [f"user-{i % 250}" for i in range(1000)],
        }
    )
    out = hll_distinct(
        ray.data.from_arrow(t).repartition(4), key="k", group="g"
    ).to_pandas()
    assert abs(int(out["n_distinct"].iloc[0]) - 250) / 250 < 0.14


# ------------------------------------------------- Misra-Gries tests


def test_mg_compress_bound():
    from bern_ray.functions.sketch import _mg_compress

    counts = {f"t{i}": i + 1 for i in range(100)}  # n = 5050
    k = 9
    mg = _mg_compress(counts, k)
    assert len(mg) <= k
    # under-count, never over-count; error <= subtracted threshold
    thresh = sorted(counts.values(), reverse=True)[k]
    for key, c in mg.items():
        assert c == counts[key] - thresh
    # the largest items survive
    assert "t99" in mg and "t98" in mg


def test_mg_exact_when_under_k():
    from bern_ray.functions.sketch import _mg_compress

    counts = {"a": 5, "b": 3}
    assert _mg_compress(counts, 10) == counts


def test_mg_heavy_hitters_skewed(ray_session):
    import ray.data

    from bern_ray.functions.sketch import mg_heavy_hitters

    # zipf-ish: planted heavy keys + a long uniform tail, spread over
    # many batches so per-batch compression actually fires
    keys = []
    for i in range(4000):
        keys.append(f"tail-{i}")  # 4000 singletons
    heavy = {"alpha": 900, "beta": 700, "gamma": 500, "delta": 300}
    for kk, n in heavy.items():
        keys.extend([kk] * n)
    # deterministic interleave so heavies span every batch
    keys = [keys[(i * 2654435761) % len(keys)] for i in range(len(keys))]
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
    out = mg_heavy_hitters(ds, "k", k=64, top_n=4).to_pandas()
    # every key with true_count > n/(k+1) (= ~100) must be reported,
    # in true order, with reported <= true
    assert list(out["key"]) == ["alpha", "beta", "gamma", "delta"]
    for _, row in out.iterrows():
        assert row["approx_count"] <= heavy[row["key"]]
        assert row["approx_count"] >= heavy[row["key"]] - len(keys) / 65


# ------------------------------------------------------- KLL tests


def test_kll_compact_bound_and_mass():
    import numpy as np

    from bern_ray.functions.sketch import _kll_compact

    rng = np.random.RandomState(7)
    v = rng.rand(10000)
    w = np.ones(len(v), dtype=np.int64)
    cv, cw = _kll_compact(v, w, k=64)
    assert len(cv) <= 2 * 64
    assert cw.sum() == 10000  # pair-merge conserves total mass
    assert set(np.unique(cw)) <= {2**i for i in range(40)}


def test_kll_compact_deterministic():
    import numpy as np

    from bern_ray.functions.sketch import _kll_compact

    rng = np.random.RandomState(11)
    v = rng.rand(5000)
    w = np.ones(len(v), dtype=np.int64)
    a = _kll_compact(v.copy(), w.copy(), k=32)
    b = _kll_compact(v.copy(), w.copy(), k=32)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_kll_quantiles_accuracy(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.sketch import kll_quantiles

    rng = np.random.RandomState(3)
    vals = rng.lognormal(0, 1, 50000)
    ds = ray.data.from_arrow(
        pa.table({"value": pa.array(vals, type=pa.float64())})
    ).repartition(8)
    out = (
        kll_quantiles(ds, "value", qs=(0.25, 0.5, 0.9, 0.99), k=256)
        .to_pandas()
        .set_index("q")["value"]
    )
    s = np.sort(vals)
    n = len(s)
    for q in (0.25, 0.5, 0.9, 0.99):
        est = out.loc[q]
        # rank error: where does the estimate land in the true order?
        rank = np.searchsorted(s, est) / n
        assert abs(rank - q) < 0.02, (q, est, rank)


# ----------------------------------------------------- Bloom tests


def test_bloom_no_false_negatives(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.sketch import bloom_build, bloom_filter_new

    m = 1 << 17  # bits
    prior_keys = [f"doc-{i}" for i in range(2000)]
    prior = ray.data.from_arrow(
        pa.table({"k": pa.array(prior_keys, type=pa.string())})
    ).repartition(4)
    bm = bloom_build(prior, "k", m_bits=m)
    assert bm.dtype == np.uint8 and len(bm) == m // 8

    # probe: 2000 seen + 2000 new
    inc_keys = prior_keys + [f"new-{i}" for i in range(2000)]
    inc = ray.data.from_arrow(
        pa.table({"k": pa.array(inc_keys, type=pa.string())})
    ).repartition(4)
    out = bloom_filter_new(inc, bm, "k", m_bits=m).to_pandas()
    survived = set(out["k"])
    # NO false negatives: every seen key is filtered out
    assert not (survived & set(prior_keys))
    # false positives bounded: ~10 bits/key, 7 hashes -> ~1% FP
    fp = 2000 - len(survived)
    assert fp / 2000 < 0.05, fp


def test_bloom_build_or_merge_idempotent(ray_session):
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.sketch import bloom_build

    keys = [f"x-{i}" for i in range(500)]
    t = pa.table({"k": pa.array(keys * 3, type=pa.string())})
    a = bloom_build(
        ray.data.from_arrow(t).repartition(1), "k", m_bits=1 << 16
    )
    b = bloom_build(
        ray.data.from_arrow(t).repartition(6), "k", m_bits=1 << 16
    )
    assert (a == b).all()  # OR-merge is partition-invariant


def test_hll_int_group_column(ray_session):
    """A non-string group column must flow through (the partial
    preserves the input dtype instead of forcing pa.string())."""
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.sketch import hll_distinct

    t = pa.table(
        {
            "k": pa.array(list(range(400)) * 2, type=pa.int64()),
            "g": pa.array(([1] * 400 + [2] * 400), type=pa.int64()),
        }
    )
    out = hll_distinct(
        ray.data.from_arrow(t).repartition(4), "k", "g", p=10
    ).to_pandas()
    assert set(out["g"]) == {1, 2}
    for _, row in out.iterrows():
        assert abs(row["n_distinct"] - 400) / 400 < 0.14


def test_kll_empty_and_all_nan(ray_session):
    """Empty / all-NaN input yields NaN per requested quantile, not an
    IndexError in the weighted-quantile merge."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.sketch import kll_quantiles

    t = pa.table(
        {"v": pa.array([float("nan")] * 10, type=pa.float64())}
    )
    out = kll_quantiles(
        ray.data.from_arrow(t), "v", qs=(0.5, 0.9)
    ).to_pandas()
    assert list(out["q"]) == [0.5, 0.9]
    assert out["value"].isna().all()


def test_count_min_bounds_and_merge(ray_session):
    """Count-Min estimates are one-sided: true <= est <= true + eN/w
    (here width >> distinct keys, so est == true); partial-sum merge
    is partition-invariant."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.sketch import cm_build, cm_estimate

    rng = np.random.default_rng(5)
    keys = [f"k{int(i)}" for i in rng.zipf(1.5, size=20_000) if i < 50]
    t = pa.table({"k": pa.array(keys, type=pa.string())})
    true = {}
    for s in keys:
        true[s] = true.get(s, 0) + 1
    a = cm_build(ray.data.from_arrow(t).repartition(1), "k", width=1 << 14)
    b = cm_build(ray.data.from_arrow(t).repartition(7), "k", width=1 << 14)
    assert (a == b).all()  # sum-merge is partition-invariant
    probe = sorted(true)[:20]
    est = cm_estimate(a, probe, width=1 << 14)
    for s, e in zip(probe, est):
        assert e >= true[s]  # never under-counts
        assert e <= true[s] + len(keys) * 2.718 / (1 << 14) + 1


def test_cm_join_size_bound(ray_session):
    """Inner-product join-size estimate: never under the true size,
    over by at most e/width * Na * Nb (probabilistic, wide margin)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.sketch import cm_join_size

    rng = np.random.default_rng(11)
    # A: each key once (dimension side); B: skewed multiplicities
    a_keys = [f"k{i}" for i in range(2000)]
    b_draw = rng.zipf(1.3, size=30_000)
    b_keys = [f"k{int(i)}" for i in b_draw if i < 2000]
    true = len(b_keys)  # every B key hits exactly one A row
    ta = pa.table({"k": pa.array(a_keys, type=pa.string())})
    tb = pa.table({"k": pa.array(b_keys, type=pa.string())})
    w = 1 << 14
    est = cm_join_size(
        ray.data.from_arrow(ta).repartition(3), "k",
        ray.data.from_arrow(tb).repartition(5), "k",
        width=w,
    )
    assert est >= true
    assert est <= true + int(2.718 / w * len(a_keys) * len(b_keys)) + 1
