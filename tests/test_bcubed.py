"""Distributed B³ vs a brute-force per-item reference implementation,
plus the degenerate cases (perfect clustering, all-in-one, null
gold exclusion)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.evaluation import bcubed


def _brute_b3(pred, gold):
    pred = np.asarray(pred)
    gold = np.asarray(gold)
    n = len(pred)
    p = r = 0.0
    for i in range(n):
        c = pred == pred[i]
        g = gold == gold[i]
        both = (c & g).sum()
        p += both / c.sum()
        r += both / g.sum()
    return p / n, r / n


def _run(pred, gold):
    t = pa.table(
        {
            "pred": pa.array(pred, type=pa.string()),
            "gold": pa.array(gold, type=pa.string()),
        }
    )
    return (
        bcubed(ray.data.from_arrow(t).repartition(3), "pred", "gold")
        .to_pandas()
        .iloc[0]
    )


@pytest.mark.usefixtures("ray_session")
def test_matches_brute_force():
    rng = np.random.default_rng(7)
    pred = [f"c{v}" for v in rng.integers(0, 6, size=80)]
    gold = [f"g{v}" for v in rng.integers(0, 5, size=80)]
    out = _run(pred, gold)
    p, r = _brute_b3(pred, gold)
    assert out["n_items"] == 80
    assert abs(out["b3_precision"] - round(p, 6)) < 1e-9
    assert abs(out["b3_recall"] - round(r, 6)) < 1e-9
    f1 = 2 * p * r / (p + r)
    assert abs(out["b3_f1"] - round(f1, 6)) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_perfect_and_degenerate():
    # perfect clustering: everything 1.0
    out = _run(["a", "a", "b", "b", "c"], ["x", "x", "y", "y", "z"])
    assert out["b3_precision"] == 1.0
    assert out["b3_recall"] == 1.0
    assert out["b3_f1"] == 1.0
    # one mega-cluster over 2 equal gold groups: precision 0.5, recall 1
    out = _run(["a", "a", "a", "a"], ["x", "x", "y", "y"])
    assert out["b3_precision"] == 0.5
    assert out["b3_recall"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_null_gold_excluded():
    t = pa.table(
        {
            "pred": pa.array(["a", "a", "b"], type=pa.string()),
            "gold": pa.array(["x", None, "y"], type=pa.string()),
        }
    )
    out = (
        bcubed(ray.data.from_arrow(t), "pred", "gold").to_pandas().iloc[0]
    )
    assert out["n_items"] == 2
    assert out["b3_precision"] == 1.0
    assert out["b3_recall"] == 1.0


# ---- pairwise precision/recall/F1 (same contingency machinery) ----

from itertools import combinations

from bern_ray.functions.evaluation import pairwise_eval


def _brute_pairwise(pred, gold):
    n = len(pred)
    tp = pp = gp = 0
    for i, j in combinations(range(n), 2):
        same_p = pred[i] == pred[j]
        same_g = gold[i] == gold[j]
        pp += same_p
        gp += same_g
        tp += same_p and same_g
    p = tp / pp if pp else 0.0
    r = tp / gp if gp else 0.0
    return p, r


def _run_pairwise(pred, gold):
    t = pa.table(
        {
            "pred": pa.array(pred, type=pa.string()),
            "gold": pa.array(gold, type=pa.string()),
        }
    )
    return (
        pairwise_eval(
            ray.data.from_arrow(t).repartition(3), "pred", "gold"
        )
        .to_pandas()
        .iloc[0]
    )


def test_pairwise_matches_bruteforce():
    rng = np.random.default_rng(7)
    pred = [f"c{v}" for v in rng.integers(0, 6, 120)]
    gold = [f"g{v}" for v in rng.integers(0, 5, 120)]
    row = _run_pairwise(pred, gold)
    p, r = _brute_pairwise(pred, gold)
    assert row["n_items"] == 120
    assert row["pair_precision"] == pytest.approx(p, abs=1e-6)
    assert row["pair_recall"] == pytest.approx(r, abs=1e-6)
    f1 = 2 * p * r / (p + r)
    assert row["pair_f1"] == pytest.approx(f1, abs=1e-6)


def test_pairwise_perfect_and_degenerate():
    row = _run_pairwise(["a", "a", "b"], ["x", "x", "y"])
    assert row["pair_precision"] == 1.0
    assert row["pair_recall"] == 1.0
    assert row["pair_f1"] == 1.0
    # no gold pairs and no pred pairs -> all-zero convention, no NaN
    row = _run_pairwise(["a", "b", "c"], ["x", "y", "z"])
    assert row["pair_precision"] == 0.0
    assert row["pair_recall"] == 0.0
    assert row["pair_f1"] == 0.0


def test_pairwise_refinement_recall_one():
    # gold refines pred (pred merges two gold groups): every gold
    # pair is a pred pair -> recall exactly 1.0, precision < 1
    pred = ["m", "m", "m", "m", "s"]
    gold = ["x", "x", "y", "y", "z"]
    row = _run_pairwise(pred, gold)
    assert row["pair_recall"] == 1.0
    assert row["pair_precision"] == pytest.approx(2 / 6, abs=1e-6)


# ---- ARI and NMI (same contingency machinery) ----

from bern_ray.functions.evaluation import adjusted_rand, nmi


def _brute_ari(pred, gold):
    n = len(pred)
    tp = pp = gp = 0
    for i, j in combinations(range(n), 2):
        same_p = pred[i] == pred[j]
        same_g = gold[i] == gold[j]
        pp += same_p
        gp += same_g
        tp += same_p and same_g
    total = n * (n - 1) / 2.0
    e = pp * gp / total
    denom = (pp + gp) / 2.0 - e
    return (tp - e) / denom if denom else 1.0


def _brute_nmi(pred, gold):
    import collections
    import math

    n = len(pred)
    cj = collections.Counter(zip(pred, gold))
    cp = collections.Counter(pred)
    cg = collections.Counter(gold)

    def ent(counts):
        return -sum((c / n) * math.log(c / n) for c in counts.values())

    hp, hg, hj = ent(cp), ent(cg), ent(cj)
    mi = max(hp + hg - hj, 0.0)
    return hp, hg, mi, (2 * mi / (hp + hg) if hp + hg else 1.0)


def _ds(pred, gold):
    t = pa.table(
        {
            "pred": pa.array(pred, type=pa.string()),
            "gold": pa.array(gold, type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(3)


def test_ari_matches_bruteforce():
    rng = np.random.default_rng(11)
    pred = [f"c{v}" for v in rng.integers(0, 6, 120)]
    gold = [f"g{v}" for v in rng.integers(0, 5, 120)]
    row = adjusted_rand(_ds(pred, gold), "pred", "gold").to_pandas().iloc[0]
    assert row["n_items"] == 120
    assert row["ari"] == pytest.approx(_brute_ari(pred, gold), abs=1e-6)


def test_ari_identical_and_independent():
    # identical partitions -> ARI exactly 1
    row = (
        adjusted_rand(_ds(["a", "a", "b"], ["x", "x", "y"]), "pred", "gold")
        .to_pandas()
        .iloc[0]
    )
    assert row["ari"] == 1.0
    # all-singletons vs all-singletons: degenerate denominator -> 1.0
    row = (
        adjusted_rand(_ds(["a", "b", "c"], ["x", "y", "z"]), "pred", "gold")
        .to_pandas()
        .iloc[0]
    )
    assert row["ari"] == 1.0


def test_nmi_matches_bruteforce():
    rng = np.random.default_rng(13)
    pred = [f"c{v}" for v in rng.integers(0, 6, 120)]
    gold = [f"g{v}" for v in rng.integers(0, 5, 120)]
    row = nmi(_ds(pred, gold), "pred", "gold").to_pandas().iloc[0]
    hp, hg, mi, v = _brute_nmi(pred, gold)
    assert row["n_items"] == 120
    assert row["h_pred"] == pytest.approx(hp, abs=1e-6)
    assert row["h_gold"] == pytest.approx(hg, abs=1e-6)
    assert row["mi"] == pytest.approx(mi, abs=1e-6)
    assert row["nmi"] == pytest.approx(v, abs=1e-6)


def test_nmi_identical_partitions():
    row = (
        nmi(_ds(["a", "a", "b", "c"], ["x", "x", "y", "z"]), "pred", "gold")
        .to_pandas()
        .iloc[0]
    )
    assert row["nmi"] == 1.0


def test_vmeasure_matches_bruteforce():
    from bern_ray.functions.evaluation import vmeasure

    rng = np.random.default_rng(17)
    pred = [f"c{v}" for v in rng.integers(0, 6, 120)]
    gold = [f"g{v}" for v in rng.integers(0, 5, 120)]
    row = vmeasure(_ds(pred, gold), "pred", "gold").to_pandas().iloc[0]
    hp, hg, mi, _ = _brute_nmi(pred, gold)
    hj = hp + hg - mi
    hom = 1 - max(hj - hp, 0.0) / hg
    com = 1 - max(hj - hg, 0.0) / hp
    v = 2 * hom * com / (hom + com)
    assert row["homogeneity"] == pytest.approx(hom, abs=1e-6)
    assert row["completeness"] == pytest.approx(com, abs=1e-6)
    assert row["v_measure"] == pytest.approx(v, abs=1e-6)


def test_vmeasure_refinement_completeness_one():
    from bern_ray.functions.evaluation import vmeasure

    # gold refines pred -> H(pred|gold)=0 -> completeness exactly 1
    pred = ["m", "m", "m", "m", "s", "s"]
    gold = ["x", "x", "y", "y", "z", "z"]
    row = vmeasure(_ds(pred, gold), "pred", "gold").to_pandas().iloc[0]
    assert row["completeness"] == 1.0
    assert 0 < row["homogeneity"] < 1


def test_pr_curve_matches_duckdb_and_monotone(ray_session):
    """The threshold-sweep curve is value-identical to the DuckDB
    oracle at sf0.001 and satisfies the sweep invariants: n_selected
    and tp are non-increasing in the threshold, recall is
    non-increasing, and tp <= min(n_selected, gold_pairs)."""
    import duckdb

    from bern_ray.pipelines.relational import (
        SQL_PR_CURVE,
        q_pr_curve_dedup_eval,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        q_pr_curve_dedup_eval(sf)
        .to_pandas()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = (
        con.sql(SQL_PR_CURVE)
        .df()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    for c in ("threshold", "n_selected", "tp", "gold_pairs",
              "precision", "recall", "f1"):
        assert (
            got[c].astype(float).round(6).tolist()
            == exp[c].astype(float).round(6).tolist()
        ), c
    assert (got.n_selected.diff().dropna() <= 0).all()
    assert (got.tp.diff().dropna() <= 0).all()
    assert (got.recall.diff().dropna() <= 1e-9).all()
    assert (got.tp <= got.n_selected).all()
    assert (got.tp <= got.gold_pairs).all()
    assert got.n_selected.iloc[0] > got.n_selected.iloc[-1] > 0


def _brute_muc(pred, gold):
    """Classic per-cluster MUC sums (Vilain et al. 1995)."""
    pred = np.asarray(pred)
    gold = np.asarray(gold)

    def side(part, other):
        num = den = 0
        for lab in np.unique(part):
            m = part == lab
            num += m.sum() - len(np.unique(other[m]))
            den += m.sum() - 1
        return num, den

    rn, rd = side(gold, pred)
    pn, pd_ = side(pred, gold)
    r = rn / rd if rd else (1.0 if rn == 0 else 0.0)
    p = pn / pd_ if pd_ else (1.0 if pn == 0 else 0.0)
    return p, r


def _run_muc(pred, gold):
    from bern_ray.functions.evaluation import muc

    t = pa.table(
        {
            "pred": pa.array(pred, type=pa.string()),
            "gold": pa.array(gold, type=pa.string()),
        }
    )
    return (
        muc(ray.data.from_arrow(t).repartition(3), "pred", "gold")
        .to_pandas()
        .iloc[0]
    )


def test_muc_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = 60
        pred = [f"c{v}" for v in rng.integers(0, 9, size=n)]
        gold = [f"g{v}" for v in rng.integers(0, 7, size=n)]
        row = _run_muc(pred, gold)
        p, r = _brute_muc(pred, gold)
        assert row["muc_precision"] == round(p, 6)
        assert row["muc_recall"] == round(r, 6)
        f = 2 * p * r / (p + r) if p + r else 0.0
        assert row["muc_f1"] == round(f, 6)


def test_muc_degenerate_cases(ray_session):
    # identical partitions: P = R = F1 = 1
    row = _run_muc(["a", "a", "b"], ["x", "x", "y"])
    assert row["muc_precision"] == 1.0 and row["muc_recall"] == 1.0
    # all-singleton pred vs one gold block: precision defined 1.0
    # (no links asserted), recall 0
    row = _run_muc(["a", "b", "c"], ["g", "g", "g"])
    assert row["muc_precision"] == 1.0
    assert row["muc_recall"] == 0.0
    # all-singleton BOTH: identical trivial partitions -> 1.0 / 1.0
    row = _run_muc(["a", "b", "c"], ["x", "y", "z"])
    assert row["muc_precision"] == 1.0 and row["muc_recall"] == 1.0


def _brute_blanc(pred, gold):
    """Pair-inventory BLANC reference: enumerate all C(n,2) pairs,
    classify each as link/non-link in each partition."""
    pred = np.asarray(pred)
    gold = np.asarray(gold)
    rc = rn = pl = gl = 0
    n = len(pred)
    for i, j in combinations(range(n), 2):
        lp = pred[i] == pred[j]
        lg = gold[i] == gold[j]
        pl += lp
        gl += lg
        rc += lp and lg
        rn += (not lp) and (not lg)
    t = n * (n - 1) // 2

    def f1(p, r):
        return 2 * p * r / (p + r) if p + r else 0.0

    fl = f1(rc / pl if pl else 0.0, rc / gl if gl else 0.0)
    fn = f1(
        rn / (t - pl) if t != pl else 0.0,
        rn / (t - gl) if t != gl else 0.0,
    )
    if pl == 0 and gl == 0:
        b = fn
    elif pl == t and gl == t:
        b = fl
    else:
        b = (fl + fn) / 2.0
    return rc, rn, fl, fn, b


def _run_blanc(pred, gold):
    from bern_ray.functions.evaluation import blanc

    t = pa.table(
        {
            "pred": pa.array(pred, type=pa.string()),
            "gold": pa.array(gold, type=pa.string()),
        }
    )
    return (
        blanc(ray.data.from_arrow(t).repartition(3), "pred", "gold")
        .to_pandas()
        .iloc[0]
    )


def test_blanc_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = 60
        pred = [f"c{v}" for v in rng.integers(0, 9, size=n)]
        gold = [f"g{v}" for v in rng.integers(0, 7, size=n)]
        row = _run_blanc(pred, gold)
        rc, rn, fl, fn, b = _brute_blanc(pred, gold)
        assert row["rc_links"] == rc
        assert row["rn_nonlinks"] == rn
        assert row["f_link"] == round(fl, 6)
        assert row["f_non"] == round(fn, 6)
        assert row["blanc"] == round(b, 6)


def test_blanc_boundary_cases(ray_session):
    # identical partitions: both Fs 1.0, blanc 1.0
    row = _run_blanc(["a", "a", "b"], ["x", "x", "y"])
    assert row["f_link"] == 1.0 and row["f_non"] == 1.0
    assert row["blanc"] == 1.0
    # all-singletons BOTH: no links anywhere -> blanc = f_non = 1.0
    row = _run_blanc(["a", "b", "c"], ["x", "y", "z"])
    assert row["blanc"] == 1.0 and row["f_non"] == 1.0
    # one-cluster BOTH: no non-links -> blanc = f_link = 1.0
    row = _run_blanc(["a", "a", "a"], ["g", "g", "g"])
    assert row["blanc"] == 1.0 and row["f_link"] == 1.0
    # orthogonal-ish: singletons vs one block -> f_link 0
    row = _run_blanc(["a", "b", "c"], ["g", "g", "g"])
    rc, rn, fl, fn, b = _brute_blanc(
        ["a", "b", "c"], ["g", "g", "g"]
    )
    assert row["f_link"] == round(fl, 6) == 0.0
    assert row["blanc"] == round(b, 6)


def test_hungarian_matches_bruteforce():
    from itertools import permutations

    from bern_ray.functions.evaluation import _hungarian_max

    rng = np.random.default_rng(17)
    for trial in range(20):
        nr = int(rng.integers(1, 6))
        nc = int(rng.integers(1, 6))
        m = rng.random((nr, nc))
        # brute force over injective col assignments for min side
        if nr <= nc:
            best = max(
                sum(m[i, p[i]] for i in range(nr))
                for p in permutations(range(nc), nr)
            )
        else:
            best = max(
                sum(m[p[j], j] for j in range(nc))
                for p in permutations(range(nr), nc)
            )
        got = _hungarian_max(m)
        assert abs(got - best) < 1e-9, (trial, got, best)


def _brute_ceaf(pred, gold, phi):
    from itertools import permutations

    import collections

    pc_ = collections.Counter(pred)
    gc_ = collections.Counter(gold)
    P = sorted(pc_)
    G = sorted(gc_)
    inter = {
        (c, k): sum(
            1 for p, g in zip(pred, gold) if p == c and g == k
        )
        for c in P
        for k in G
    }

    def sim(c, k):
        i = inter[(c, k)]
        if phi == "m":
            return float(i)
        return 2.0 * i / (pc_[c] + gc_[k]) if i else 0.0

    if len(P) <= len(G):
        best = max(
            sum(sim(c, kk) for c, kk in zip(P, combo))
            for combo in permutations(G, len(P))
        )
    else:
        best = max(
            sum(sim(cc, k) for cc, k in zip(combo, G))
            for combo in permutations(P, len(G))
        )
    n = len(pred)
    if phi == "m":
        prec = rec = best / n
    else:
        prec = best / len(P)
        rec = best / len(G)
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return best, prec, rec, f1


@pytest.mark.parametrize("phi", ["m", "e"])
def test_ceaf_matches_bruteforce(ray_session, phi):
    from bern_ray.functions.evaluation import ceaf

    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 40
        pred = [f"c{v}" for v in rng.integers(0, 5, size=n)]
        gold = [f"g{v}" for v in rng.integers(0, 4, size=n)]
        t = pa.table(
            {
                "pred": pa.array(pred, type=pa.string()),
                "gold": pa.array(gold, type=pa.string()),
            }
        )
        row = (
            ceaf(
                ray.data.from_arrow(t).repartition(3),
                "pred",
                "gold",
                phi=phi,
            )
            .to_pandas()
            .iloc[0]
        )
        best, prec, rec, f1 = _brute_ceaf(pred, gold, phi)
        assert abs(row["phi_star"] - round(best, 6)) < 1e-9
        assert row["ceaf_precision"] == round(prec, 6)
        assert row["ceaf_recall"] == round(rec, 6)
        assert row["ceaf_f1"] == round(f1, 6)
    # identical partitions: perfect scores in both variants
    row = (
        ceaf(
            ray.data.from_arrow(
                pa.table(
                    {
                        "pred": pa.array(["a", "a", "b"]),
                        "gold": pa.array(["x", "x", "y"]),
                    }
                )
            ),
            "pred",
            "gold",
            phi=phi,
        )
        .to_pandas()
        .iloc[0]
    )
    assert row["ceaf_f1"] == 1.0
