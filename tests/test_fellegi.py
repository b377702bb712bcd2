"""Fellegi-Sunter EM (functions/fellegi.py).

Correctness layers:
  1. the EM kernel against an independently-written scalar reference
     (per-pattern Python loop, no numpy reductions) — same updates,
     different arithmetic order, so agreement within the kernel's own
     round-6 output rule is evidence the vectorized kernel computes
     the model, not just itself;
  2. parameter recovery on an exact expected-count table generated
     FROM known (lambda, m, u) — EM at its fixed point must sit on the
     generating parameters;
  3. the distributed pattern-count path at sf0.001 against the DuckDB
     pairs oracle, plus bucket-count invariance (the partial-bincount
     combine is linear, so the shuffle layout cannot change counts).
"""

import itertools

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from bern_ray.functions.fellegi import (
    FS_INIT_LAMBDA,
    FS_INIT_M,
    FS_INIT_U,
    FS_ITERS,
    fs_em,
    fs_em_sql,
)

SF = "/root/testdata/sf0.001"


def _counts_table(rows):
    g = np.array([r[0] for r in rows])
    return pa.table(
        {
            "g_name": pa.array(g[:, 0], type=pa.int64()),
            "g_nation": pa.array(g[:, 1], type=pa.int64()),
            "g_segment": pa.array(g[:, 2], type=pa.int64()),
            "n_pairs": pa.array(
                [r[1] for r in rows], type=pa.int64()
            ),
        }
    )


def _scalar_em(rows, iters=FS_ITERS):
    """Per-pattern scalar EM, written independently of the kernel."""
    lam, m, u = FS_INIT_LAMBDA, [FS_INIT_M] * 3, [FS_INIT_U] * 3
    for _ in range(iters):
        stats = []  # (n, post, g)
        for g, n in rows:
            pm, pu = lam, 1.0 - lam
            for i in range(3):
                pm *= m[i] if g[i] else 1.0 - m[i]
                pu *= u[i] if g[i] else 1.0 - u[i]
            stats.append((n, pm / (pm + pu), g))
        mm = sum(n * p for n, p, _ in stats)
        uu = sum(n * (1 - p) for n, p, _ in stats)
        lam = mm / (mm + uu)
        m = [
            sum(n * p * g[i] for n, p, g in stats) / mm
            for i in range(3)
        ]
        u = [
            sum(n * (1 - p) * g[i] for n, p, g in stats) / uu
            for i in range(3)
        ]
    return lam, m, u


FIXTURE = [
    ((0, 0, 0), 780),
    ((0, 0, 1), 150),
    ((0, 1, 0), 33),
    ((0, 1, 1), 15),
    ((1, 0, 0), 918),
    ((1, 0, 1), 192),
    ((1, 1, 0), 59),
    ((1, 1, 1), 103),
]


def test_em_kernel_matches_scalar_reference():
    out = {
        r["param"]: r["value"]
        for r in fs_em(_counts_table(FIXTURE)).to_pylist()
    }
    lam, m, u = _scalar_em(FIXTURE)
    assert out["lambda"] == pytest.approx(lam, abs=5e-7)
    for i, f in enumerate(("name", "nation", "segment")):
        assert out[f"m_{f}"] == pytest.approx(m[i], abs=5e-7)
        assert out[f"u_{f}"] == pytest.approx(u[i], abs=5e-7)
        assert out[f"weight_{f}"] == pytest.approx(
            np.log2(m[i] / u[i]), abs=1e-6
        )
    # determinism: bit-identical on a second run
    again = fs_em(_counts_table(FIXTURE)).to_pylist()
    assert again == fs_em(_counts_table(FIXTURE)).to_pylist()


def test_em_recovers_generating_parameters():
    """Counts = N * exact mixture probabilities for known params; the
    generating parameters are an EM fixed point, so 20 iterations from
    the standard init must land on them (identifiable: m != u)."""
    lam_t, m_t, u_t = 0.2, [0.95, 0.8, 0.9], [0.3, 0.05, 0.2]
    rows = []
    for g in itertools.product((0, 1), repeat=3):
        pm = lam_t
        pu = 1.0 - lam_t
        for i in range(3):
            pm *= m_t[i] if g[i] else 1.0 - m_t[i]
            pu *= u_t[i] if g[i] else 1.0 - u_t[i]
        rows.append((g, 1_000_000 * (pm + pu)))
    t = pa.table(
        {
            "g_name": pa.array(
                [g[0] for g, _ in rows], type=pa.int64()
            ),
            "g_nation": pa.array(
                [g[1] for g, _ in rows], type=pa.int64()
            ),
            "g_segment": pa.array(
                [g[2] for g, _ in rows], type=pa.int64()
            ),
            "n_pairs": pa.array(
                [n for _, n in rows], type=pa.float64()
            ),
        }
    )
    out = {r["param"]: r["value"] for r in fs_em(t).to_pylist()}
    assert out["lambda"] == pytest.approx(lam_t, abs=0.02)
    for i, f in enumerate(("name", "nation", "segment")):
        assert out[f"m_{f}"] == pytest.approx(m_t[i], abs=0.02)
        assert out[f"u_{f}"] == pytest.approx(u_t[i], abs=0.02)
        assert out[f"weight_{f}"] > 0.0


def test_distributed_counts_match_oracle_and_bucket_invariant(
    ray_session,
):
    from bern_ray.functions.fellegi import fs_pattern_counts
    from bern_ray.functions.fuzzyjoin import suffix_digits_block
    from bern_ray.pipelines.relational import (
        SQL_FS_PATTERNS,
        _fs_clean,
        _fs_dirty,
    )

    def run(num_buckets):
        df = (
            fs_pattern_counts(
                _fs_clean(SF),
                _fs_dirty(SF),
                block_fn=lambda ns: suffix_digits_block(ns, k=1),
                num_buckets=num_buckets,
            )
            .to_pandas()
            .sort_values(["g_name", "g_nation", "g_segment"])
            .reset_index(drop=True)
        )
        return df

    a, b = run(64), run(4)
    assert a.equals(b), "bucket layout changed counts"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF}/customer.parquet')"
    )
    o = (
        con.execute(SQL_FS_PATTERNS)
        .df()
        .sort_values(["g_name", "g_nation", "g_segment"])
        .reset_index(drop=True)
    )
    assert list(a["n_pairs"]) == list(o["n_pairs"])


def _scalar_decisions(rows, mu, lam_err, iters=FS_ITERS):
    """Independent scalar rendering of the FS 1969 trichotomy: sort
    patterns by weight, walk cumulative error masses from both ends.
    Returns {pattern_bits: (weight, decision)}."""
    import math

    lam, m, u = _scalar_em(rows, iters)
    pats = []
    for g, n in rows:
        w = 0.0
        pm, pu = 1.0, 1.0
        for i in range(3):
            if g[i]:
                w += math.log2(m[i] / u[i])
                pm *= m[i]
                pu *= u[i]
            else:
                w += math.log2((1 - m[i]) / (1 - u[i]))
                pm *= 1 - m[i]
                pu *= 1 - u[i]
        pats.append({"g": g, "w": w, "pm": pm, "pu": pu})
    pats.sort(key=lambda p: (-p["w"], tuple(-b for b in p["g"])))
    cu = 0.0
    link = set()
    for p in pats:
        cu += p["pu"]
        if cu <= mu:
            link.add(p["g"])
    cm = 0.0
    non_link = set()
    for p in reversed(pats):
        cm += p["pm"]
        if cm <= lam_err:
            non_link.add(p["g"])
    out = {}
    for p in pats:
        if p["g"] in link:
            d = "link"
        elif p["g"] in non_link:
            d = "non_link"
        else:
            d = "possible"
        out[p["g"]] = (p["w"], d)
    return out


def test_decision_table_matches_scalar_reference():
    from bern_ray.functions.fellegi import fs_decision_table

    mu, lam_err = 0.05, 0.05
    got = fs_decision_table(
        _counts_table(FIXTURE), mu=mu, lam_err=lam_err
    ).to_pylist()
    ref = _scalar_decisions(FIXTURE, mu, lam_err)
    assert len(got) == len(FIXTURE)
    for r in got:
        g = (r["g_name"], r["g_nation"], r["g_segment"])
        w_ref, d_ref = ref[g]
        assert r["match_weight"] == pytest.approx(w_ref, abs=5e-6)
        assert r["decision"] == d_ref
    # output is in match-weight-descending order
    ws = [r["match_weight"] for r in got]
    assert ws == sorted(ws, reverse=True)
    # counts survive the reorder
    assert {
        (r["g_name"], r["g_nation"], r["g_segment"]): r["n_pairs"]
        for r in got
    } == {g: n for g, n in FIXTURE}


def test_decision_regions_are_weight_contiguous():
    """link / possible / non_link must partition the weight order into
    three contiguous runs (the FS thresholds are weight cutoffs), and
    each region's masses must respect its error bound."""
    from bern_ray.functions.fellegi import fs_decision_table

    mu, lam_err = 0.05, 0.05
    got = fs_decision_table(
        _counts_table(FIXTURE), mu=mu, lam_err=lam_err
    ).to_pylist()
    decs = [r["decision"] for r in got]
    order = {"link": 0, "possible": 1, "non_link": 2}
    ranks = [order[d] for d in decs]
    assert ranks == sorted(ranks), f"regions interleave: {decs}"
    assert set(decs) == {"link", "possible", "non_link"}
    assert (
        sum(r["p_unmatch"] for r in got if r["decision"] == "link")
        <= mu + 1e-9
    )
    assert (
        sum(r["p_match"] for r in got if r["decision"] == "non_link")
        <= lam_err + 1e-9
    )


def test_decide_pairs_applies_table(ray_session):
    """fs_decide_pairs labels every blocked pair with exactly the
    decision/weight its agreement pattern has in the decision table;
    a pattern absent from the table falls back to ('possible', NaN)."""
    import ray.data

    from bern_ray.functions.fellegi import (
        fs_decide_pairs,
        fs_decision_table,
        fs_pattern_counts,
        _collect_counts,
    )

    left = ray.data.from_items(
        [
            {
                "l_id": i,
                "l_name": f"Customer#{i:09d}",
                "l_nation": i % 3,
                "l_segment": ["AUTO", "HOUSE"][i % 2],
            }
            for i in range(40)
        ]
    )
    right = ray.data.from_items(
        [
            {
                "r_id": i,
                "r_name": f"Customer#{i:09d}"
                if i % 4
                else f"Xustomer#{i:09d}",
                "r_nation": i % 3 if i % 5 else (i + 1) % 3,
                "r_segment": ["AUTO", "HOUSE"][i % 2]
                if i % 7
                else "OTHER",
            }
            for i in range(40)
        ]
    )

    def block(names):
        return [int(n[-1]) for n in names]

    counts = _collect_counts(
        fs_pattern_counts(left, right, block_fn=block, jw_threshold=0.96)
    )
    decided = fs_decision_table(counts, mu=0.05, lam_err=0.05)
    lookup = {
        (r["g_name"], r["g_nation"], r["g_segment"]): (
            r["match_weight"],
            r["decision"],
        )
        for r in decided.to_pylist()
    }
    pairs = fs_decide_pairs(
        left, right, block_fn=block, decided=decided
    ).take_all()
    assert pairs, "blocked join produced no candidates"
    n_by_pat: dict = {}
    for p in pairs:
        g = (p["g_name"], p["g_nation"], p["g_segment"])
        w, d = lookup[g]
        assert p["decision"] == d
        assert p["match_weight"] == pytest.approx(w, abs=1e-9)
        n_by_pat[g] = n_by_pat.get(g, 0) + 1
    # pair inventory is consistent with the contingency table
    assert n_by_pat == {
        (r["g_name"], r["g_nation"], r["g_segment"]): r["n_pairs"]
        for r in decided.to_pylist()
    }

    # unseen pattern -> clerical fallback
    import numpy as np
    import pyarrow as pa

    one_row = decided.slice(0, 1)
    pairs2 = fs_decide_pairs(
        left, right, block_fn=block, decided=one_row
    ).take_all()
    kept = (
        one_row["g_name"][0].as_py(),
        one_row["g_nation"][0].as_py(),
        one_row["g_segment"][0].as_py(),
    )
    for p in pairs2:
        g = (p["g_name"], p["g_nation"], p["g_segment"])
        if g != kept:
            assert p["decision"] == "possible"
            assert np.isnan(p["match_weight"])


def test_em_sql_unroll_shape():
    """The oracle generator unrolls exactly iters CTE stages and ends
    in the tidy 10-row projection."""
    sql = fs_em_sql("SELECT 1 AS g_name, 1 AS g_nation, 1 AS g_segment")
    assert f"it{FS_ITERS} AS MATERIALIZED (" in sql
    assert f"it{FS_ITERS + 1}" not in sql
    assert sql.count("UNION ALL") == 9
    assert "ORDER BY param" in sql
