"""Clustering-quality evaluation: distributed B³ (B-cubed)
precision / recall / F1 of a predicted clustering against gold labels
(Bagga & Baldwin 1998; the standard ER cluster metric alongside
pairwise F1 — complements the blocking-stage metrics in
__ray_entry__ er_blocking_quality).

Identity: with contingency counts n_cg = #items with predicted
cluster c and gold label g, n_c / n_g the marginals and N the item
total,

    B3 precision = (1/N) * sum_{c,g} n_cg^2 / n_c
    B3 recall    = (1/N) * sum_{c,g} n_cg^2 / n_g

so the whole metric reduces to sums over the CONTINGENCY table —
never over items or pairs. Scale shape: per-batch partial counts of a
packed (pred, gold) key -> one groupby(key) -> a contingency Dataset
(bounded by #distinct (pred, gold) pairs, materialized in the object
store, never on the driver); each axis sum is one bucketed shuffle on
a 63-bit hash of that axis' label with a vectorized pandas finisher
(hash collisions only CO-LOCATE two labels in a bucket — the in-bucket
groupby is on the real string). The driver receives three scalars.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .textstats import _token_h64

# ASCII unit separator: cannot occur in md5 hex digests, oids or
# cluster ids (callers with labels that may contain \x1f must re-key).
_SEP = "\x1f"
_B3_NUM_BUCKETS = 256


def _as_string(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    return col


def _contingency(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> materialized contingency Dataset (pred, gold, n): count of
    items per (predicted cluster, gold label) cell — the shared
    reduction both B³ and pairwise metrics are pure functions of.
    Rows with a null pred/gold are excluded (standard: unlabeled
    items don't count)."""

    def cont_partial(t: pa.Table) -> pa.Table:
        pred = _as_string(t[pred_col])
        gold = _as_string(t[gold_col])
        keep = pc.and_kleene(pc.is_valid(pred), pc.is_valid(gold))
        if pc.sum(pc.cast(keep, pa.int64())).as_py() != len(pred):
            pred = pred.filter(keep)
            gold = gold.filter(keep)
        key = pc.binary_join_element_wise(pred, gold, _SEP)
        vc = pc.value_counts(key)
        return pa.table(
            {
                "key": vc.field("values"),
                "partial": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def split_key(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            t["key"].combine_chunks(), _SEP, max_splits=1
        )
        return pa.table(
            {
                "pred": pc.list_element(parts, 0),
                "gold": pc.list_element(parts, 1),
                "n": pc.cast(t["sum(partial)"], pa.int64()),
            }
        )

    return (
        items.map_batches(cont_partial, batch_format="pyarrow")
        .groupby("key")
        .sum("partial")
        .map_batches(split_key, batch_format="pyarrow")
        .materialize()  # contingency-bounded, object store only
    )


def bcubed(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, b3_precision, b3_recall, b3_f1).

    ``items`` has one row per evaluated item with a predicted cluster
    label and a gold label (any type castable to string); rows with a
    null gold are excluded (standard: unlabeled items don't count).
    """
    cont = _contingency(items, pred_col, gold_col)

    def axis_sum(axis: str) -> float:
        # sum over labels of (sum n^2) / (sum n) for that axis
        def tag(t: pa.Table) -> pa.Table:
            h = _token_h64(t[axis]).astype(np.uint64)
            return pa.table(
                {
                    "lab": t[axis],
                    "n": t["n"],
                    "bucket": pa.array(
                        (h % _B3_NUM_BUCKETS).astype(np.int64)
                    ),
                }
            )

        def reduce_bucket(g: pd.DataFrame) -> pa.Table:
            n = g["n"].to_numpy(dtype=np.float64)
            agg = (
                pd.DataFrame({"lab": g["lab"], "s2": n * n, "s": n})
                .groupby("lab", sort=False)
                .sum()
            )
            return pa.table(
                {"p": pa.array(agg["s2"] / agg["s"], type=pa.float64())}
            )

        return float(
            cont.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(reduce_bucket, batch_format="pandas")
            .sum("p")
        )

    n_items = cont.sum("n")
    if not n_items:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_items": pa.array([0], type=pa.int64()),
                    "b3_precision": pa.array([0.0]),
                    "b3_recall": pa.array([0.0]),
                    "b3_f1": pa.array([0.0]),
                }
            )
        )
    prec = axis_sum("pred") / n_items
    rec = axis_sum("gold") / n_items
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([int(n_items)], type=pa.int64()),
                "b3_precision": pa.array([round(prec, 6)]),
                "b3_recall": pa.array([round(rec, 6)]),
                "b3_f1": pa.array([round(f1, 6)]),
            }
        )
    )


def _axis_reduce(cont: "ray.data.Dataset", axis: str, per_label) -> float:
    """Bucketed marginal pass over the contingency Dataset: group
    the cells of one axis by a 256-way label-hash bucket, sum ``n``
    per REAL label inside each bucket (vectorized pandas groupby),
    map the label sums through ``per_label`` (np float array -> np
    float array of per-label contributions) and return the global
    sum. Marginal cardinality (#clusters / #gold labels) never
    reaches the driver."""

    def tag(t: pa.Table) -> pa.Table:
        h = _token_h64(t[axis]).astype(np.uint64)
        return pa.table(
            {
                "lab": t[axis],
                "n": t["n"],
                "bucket": pa.array(
                    (h % _B3_NUM_BUCKETS).astype(np.int64)
                ),
            }
        )

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        s = (
            g.groupby("lab", sort=False)["n"]
            .sum()
            .to_numpy(dtype=np.float64)
        )
        return pa.table({"p": pa.array(per_label(s), type=pa.float64())})

    return float(
        cont.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .sum("p")
    )


def _comb2(s: np.ndarray) -> np.ndarray:
    return s * (s - 1) / 2.0


def _cell_sum(cont: "ray.data.Dataset", per_cell) -> float:
    """Sum of ``per_cell(n)`` over the contingency cells (one partial
    scalar per batch, then a driver-side sum of scalars)."""

    def partial(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        n = n.astype(np.float64)
        return pa.table({"v": pa.array([float(per_cell(n).sum())])})

    return float(
        cont.map_batches(partial, batch_format="pyarrow").sum("v")
    )


def pairwise_eval(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, pair_precision, pair_recall,
    pair_f1): PAIRWISE precision/recall/F1 of a predicted clustering
    against gold labels — the ER headline metric (the north rule's
    "pairwise F1" is this quantity over labeled pairs).

    Identity: with contingency counts n_cg and marginals n_c / n_g,

        TP         = sum_{c,g} C(n_cg, 2)
        pred pairs = sum_c     C(n_c, 2)
        gold pairs = sum_g     C(n_g, 2)

    so like B³ it reduces to sums over the CONTINGENCY table — never
    over items or actual pairs. All three sums are integer-valued and
    far below 2^53, so the float divisions match a SQL oracle's
    double arithmetic exactly. Scale shape: shared with `bcubed`
    (`_contingency`): partial value_counts -> one groupby; each
    marginal is one bucketed pass over the bounded contingency set;
    the driver receives three scalars.
    """
    cont = _contingency(items, pred_col, gold_col)
    n_items = cont.sum("n")
    tp = _cell_sum(cont, _comb2) if n_items else 0.0
    pred_pairs = _axis_reduce(cont, "pred", _comb2) if n_items else 0.0
    gold_pairs = _axis_reduce(cont, "gold", _comb2) if n_items else 0.0
    prec = tp / pred_pairs if pred_pairs else 0.0
    rec = tp / gold_pairs if gold_pairs else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array(
                    [int(n_items or 0)], type=pa.int64()
                ),
                "pair_precision": pa.array([round(prec, 6)]),
                "pair_recall": pa.array([round(rec, 6)]),
                "pair_f1": pa.array([round(f1, 6)]),
            }
        )
    )


def adjusted_rand(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, tp_pairs, pred_pairs, gold_pairs,
    ari): ADJUSTED RAND INDEX of a predicted clustering against gold
    labels (Hubert & Arabie 1985) — chance-corrected pair agreement,
    the standard partition-comparison metric alongside pairwise F1.

    Identity (pure function of the same three contingency sums
    pairwise_eval computes, never of items or pairs):

        TP = sum_{c,g} C(n_cg, 2);  PP = sum_c C(n_c, 2);
        GP = sum_g C(n_g, 2);  E = PP*GP / C(N, 2)
        ARI = (TP - E) / ((PP + GP)/2 - E)

    All sums are integer-valued (exact in float64 far below 2^53), so
    the result matches a SQL oracle's double arithmetic bit-for-bit.
    Degenerate case (both partitions all-singletons or one block,
    denominator 0): returns 1.0 — the partitions are identical.
    Scale shape: shared with bcubed/pairwise_eval (`_contingency` +
    bucketed marginal passes); the driver receives scalars."""
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    tp = _cell_sum(cont, _comb2) if n_items else 0.0
    pp = _axis_reduce(cont, "pred", _comb2) if n_items else 0.0
    gp = _axis_reduce(cont, "gold", _comb2) if n_items else 0.0
    total = n_items * (n_items - 1) / 2.0
    e = pp * gp / total if total else 0.0
    denom = (pp + gp) / 2.0 - e
    ari = (tp - e) / denom if denom else 1.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "tp_pairs": pa.array([int(tp)], type=pa.int64()),
                "pred_pairs": pa.array([int(pp)], type=pa.int64()),
                "gold_pairs": pa.array([int(gp)], type=pa.int64()),
                "ari": pa.array([round(ari, 6)], type=pa.float64()),
            }
        )
    )


def _entropies(
    cont: "ray.data.Dataset", n: float
) -> tuple[float, float, float]:
    """(H_joint, H_pred, H_gold) of a contingency Dataset with total
    count ``n`` — three independent bucketed sums, no cell-marginal
    join."""

    def ent(s: np.ndarray) -> np.ndarray:
        p = s / n
        return -p * np.log(p)

    return (
        _cell_sum(cont, ent),
        _axis_reduce(cont, "pred", ent),
        _axis_reduce(cont, "gold", ent),
    )


def vmeasure(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, homogeneity, completeness,
    v_measure): the V-measure decomposition (Rosenberg & Hirschberg
    2007) of a predicted clustering against gold labels.

        homogeneity  = 1 - H(gold|pred)/H(gold)   (1 if H_gold = 0)
        completeness = 1 - H(pred|gold)/H(pred)   (1 if H_pred = 0)
        v = harmonic mean

    with the conditional entropies from the same decomposition NMI
    uses: H(gold|pred) = H_joint - H_pred (and symmetrically), so the
    whole metric is a pure function of three independent bucketed
    sums over the contingency table. Conditional entropies are
    clamped at 0 (float noise can drive H_joint - H_pred a hair
    negative when pred refines gold exactly)."""
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    if not n_items:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_items": pa.array([0], type=pa.int64()),
                    "homogeneity": pa.array([0.0]),
                    "completeness": pa.array([0.0]),
                    "v_measure": pa.array([0.0]),
                }
            )
        )
    h_joint, h_pred, h_gold = _entropies(cont, float(n_items))
    h_g_given_p = max(h_joint - h_pred, 0.0)
    h_p_given_g = max(h_joint - h_gold, 0.0)
    hom = 1.0 - h_g_given_p / h_gold if h_gold else 1.0
    com = 1.0 - h_p_given_g / h_pred if h_pred else 1.0
    v = 2 * hom * com / (hom + com) if hom + com else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "homogeneity": pa.array([round(hom, 6)]),
                "completeness": pa.array([round(com, 6)]),
                "v_measure": pa.array([round(v, 6)]),
            }
        )
    )


def nmi(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, h_pred, h_gold, mi, nmi):
    NORMALIZED MUTUAL INFORMATION (arithmetic-mean normalization,
    natural log) of a predicted clustering against gold labels — the
    information-theoretic partition-comparison metric complementing
    ARI's pair-counting view.

    Identity via the entropy decomposition — each term is an
    INDEPENDENT sum over the contingency table / one marginal, so no
    cell ever needs to see its marginals (no join):

        H_joint = -sum_{c,g} (n_cg/N) ln(n_cg/N)
        H_pred  = -sum_c (n_c/N) ln(n_c/N);  H_gold likewise
        MI = H_pred + H_gold - H_joint
        NMI = 2*MI / (H_pred + H_gold)   (1.0 when both entropies
                                          are 0: identical trivial
                                          partitions)

    Scale shape: shared with bcubed (`_contingency` + bucketed
    marginal passes). Float sums are rounded to 6 decimals, same
    regime the b3 oracle has proven stable."""
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    if not n_items:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_items": pa.array([0], type=pa.int64()),
                    "h_pred": pa.array([0.0]),
                    "h_gold": pa.array([0.0]),
                    "mi": pa.array([0.0]),
                    "nmi": pa.array([0.0]),
                }
            )
        )
    h_joint, h_pred, h_gold = _entropies(cont, float(n_items))
    mi = max(h_pred + h_gold - h_joint, 0.0)
    nmi_v = 2.0 * mi / (h_pred + h_gold) if h_pred + h_gold else 1.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "h_pred": pa.array([round(h_pred, 6)]),
                "h_gold": pa.array([round(h_gold, 6)]),
                "mi": pa.array([round(mi, 6)]),
                "nmi": pa.array([round(nmi_v, 6)]),
            }
        )
    )


def variation_of_information(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, h_gold_given_pred,
    h_pred_given_gold, vi, nvi): VARIATION OF INFORMATION (Meila
    2007) of a predicted clustering against gold labels — the
    information-theoretic partition METRIC (a true distance: zero iff
    identical, symmetric, triangle inequality), complementing NMI's
    normalized-similarity view over the identical entropy sums:

        VI = H(gold|pred) + H(pred|gold) = 2*H_joint - H_pred - H_gold
        NVI = VI / ln(N)        (Meila's bound VI <= ln N; 0 at N = 1)

    Conditional entropies are clamped at 0 (float noise can drive
    H_joint - H_pred a hair negative when pred refines gold exactly).
    Scale shape: identical to nmi — three independent bucketed sums
    over the shared contingency reduction, scalars to the driver."""
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    if not n_items:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_items": pa.array([0], type=pa.int64()),
                    "h_gold_given_pred": pa.array([0.0]),
                    "h_pred_given_gold": pa.array([0.0]),
                    "vi": pa.array([0.0]),
                    "nvi": pa.array([0.0]),
                }
            )
        )
    h_joint, h_pred, h_gold = _entropies(cont, float(n_items))
    h_g_given_p = max(h_joint - h_pred, 0.0)
    h_p_given_g = max(h_joint - h_gold, 0.0)
    vi = h_g_given_p + h_p_given_g
    nvi = vi / np.log(n_items) if n_items > 1 else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "h_gold_given_pred": pa.array([round(h_g_given_p, 6)]),
                "h_pred_given_gold": pa.array([round(h_p_given_g, 6)]),
                "vi": pa.array([round(vi, 6)]),
                "nvi": pa.array([round(float(nvi), 6)]),
            }
        )
    )


def pr_curve(
    pairs: "ray.data.Dataset",
    gold: "ray.data.Dataset",
    thresholds: list[float],
    *,
    score_col: str,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    id_col: str = "doc_id",
    gold_col: str = "gold",
) -> "ray.data.Dataset":
    """Threshold-sweep pairwise precision/recall/F1 curve — the
    operating-point report every ER deployment reads before fixing a
    match threshold (Fellegi-Sunter's m/u tradeoff as a curve).

    For each threshold t: predicted = candidate pairs with
    score >= t; tp = predicted pairs whose endpoints share a gold
    label (int64); gold_pairs = ALL same-label pairs (sum C(n,2) over
    label groups) — recall charges misses the candidate generator
    never surfaced, the blocking-aware convention.

    Scale shape: two bucketed hash joins attach the endpoint labels;
    one map_batches pass emits len(thresholds) partial counter rows
    per batch; a groupby(ti) sum lands len(thresholds) rows on the
    driver; gold_pairs is one groupby(count) + C(n,2) partial sum.
    The only driver materialization is the len(thresholds)-row
    result.
    """
    import ray.data

    from ..stages.join import bucket_join

    th = [float(t) for t in thresholds]

    def side(n: str):
        return gold.map_batches(
            lambda t, c=n: pa.table(
                {id_col: t[id_col], c: t[gold_col]}
            ),
            batch_format="pyarrow",
        )

    pair_schema = {
        id_a: pa.int64(),
        id_b: pa.int64(),
        score_col: pa.float64(),
    }
    j1 = bucket_join(
        pairs,
        side("gold_a"),
        left_on=id_a,
        right_on=id_col,
        left_schema=pair_schema,
        right_schema={id_col: pa.int64(), "gold_a": pa.int64()},
        how="left",
        left_prepare=lambda df: df.drop_duplicates([id_a, id_b]),
    )
    j2 = bucket_join(
        j1,
        side("gold_b"),
        left_on=id_b,
        right_on=id_col,
        left_schema={**pair_schema, "gold_a": pa.int64()},
        right_schema={id_col: pa.int64(), "gold_b": pa.int64()},
        how="left",
    )

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False)
        # distinct null fills: an endpoint missing from `gold` can
        # never count as a true positive
        ga = pc.cast(
            pc.fill_null(t["gold_a"], -1), pa.int64()
        ).to_numpy(zero_copy_only=False)
        gb = pc.cast(
            pc.fill_null(t["gold_b"], -2), pa.int64()
        ).to_numpy(zero_copy_only=False)
        same = ga == gb
        sel = np.empty(len(th), dtype=np.int64)
        tp = np.empty(len(th), dtype=np.int64)
        for i, t_i in enumerate(th):
            m = s >= t_i
            sel[i] = int(m.sum())
            tp[i] = int((m & same).sum())
        return pa.table(
            {
                "ti": pa.array(
                    np.arange(len(th), dtype=np.int64)
                ),
                "sel": pa.array(sel),
                "tp": pa.array(tp),
            }
        )

    sums = (
        j2.map_batches(partial, batch_format="pyarrow")
        .groupby("ti")
        .aggregate(
            ray.data.aggregate.Sum("sel", alias_name="sel"),
            ray.data.aggregate.Sum("tp", alias_name="tp"),
        )
    )

    def comb2_partial(t: pa.Table) -> pa.Table:
        n = t["count()"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {"gp": pa.array([int((n * (n - 1) // 2).sum())])}
        )

    gold_pairs = int(
        gold.groupby(gold_col)
        .count()
        .map_batches(comb2_partial, batch_format="pyarrow")
        .sum("gp")
    )

    rows = {int(r["ti"]): r for r in sums.take_all()}
    t_out, sel_o, tp_o, p_o, r_o, f_o = [], [], [], [], [], []
    for i, t_i in enumerate(th):
        sel = int(rows[i]["sel"]) if i in rows else 0
        tp = int(rows[i]["tp"]) if i in rows else 0
        p = tp / sel if sel else 0.0
        r = tp / gold_pairs if gold_pairs else 0.0
        # 2pr/(p+r) == 2*tp/(sel+G) exactly — use the integer-ratio
        # form so the SQL mirror's double arithmetic is identical
        f = (
            2 * tp / (sel + gold_pairs)
            if sel + gold_pairs
            else 0.0
        )
        t_out.append(t_i)
        sel_o.append(sel)
        tp_o.append(tp)
        p_o.append(round(p, 6))
        r_o.append(round(r, 6))
        f_o.append(round(f, 6))
    return ray.data.from_arrow(
        pa.table(
            {
                "threshold": pa.array(t_out, type=pa.float64()),
                "n_selected": pa.array(sel_o, type=pa.int64()),
                "tp": pa.array(tp_o, type=pa.int64()),
                "gold_pairs": pa.array(
                    [gold_pairs] * len(th), type=pa.int64()
                ),
                "precision": pa.array(p_o, type=pa.float64()),
                "recall": pa.array(r_o, type=pa.float64()),
                "f1": pa.array(f_o, type=pa.float64()),
            }
        )
    )


def _ones(s: np.ndarray) -> np.ndarray:
    return np.ones_like(s, dtype=np.float64)


def blanc(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, rc_links, rn_nonlinks, pred_links,
    gold_links, f_link, f_non, blanc): the BLANC bilateral
    link/non-link metric (Recasens & Hovy 2011) of a predicted
    clustering against gold labels — the fourth classic
    ER/coreference cluster metric alongside MUC, B³ and pairwise F1.
    Where pairwise F1 scores only the LINKS, BLANC averages an F over
    links with an F over NON-links, so it rewards keeping distinct
    entities apart as much as merging duplicates.

    Identity (pure function of the same contingency sums pairwise_eval
    computes — never of items or actual pairs): with
    rc = sum_{c,g} C(n_cg,2) the pairs linked in BOTH partitions,
    PL = sum_c C(n_c,2), GL = sum_g C(n_g,2), T = C(N,2),

        rn (non-links right in both) = T - PL - GL + rc
          (inclusion-exclusion: PL + GL - rc pairs are linked in at
           least one side)
        F_link = F1(rc/PL, rc/GL);  F_non = F1(rn/(T-PL), rn/(T-GL))
        BLANC  = (F_link + F_non) / 2

    Boundary convention (Recasens & Hovy §4): if neither side has any
    link (both all-singletons) BLANC = F_non alone; if every pair is
    a link on both sides (both one-cluster) BLANC = F_link alone.

    All sums are integer-valued (exact in float64 far below 2^53), so
    the result matches a SQL oracle's double arithmetic bit-for-bit.
    Scale shape: shared with bcubed/pairwise_eval (`_contingency` +
    bucketed marginal passes); the driver receives four scalars."""
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    if not n_items:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_items": pa.array([0], type=pa.int64()),
                    "rc_links": pa.array([0], type=pa.int64()),
                    "rn_nonlinks": pa.array([0], type=pa.int64()),
                    "pred_links": pa.array([0], type=pa.int64()),
                    "gold_links": pa.array([0], type=pa.int64()),
                    "f_link": pa.array([0.0]),
                    "f_non": pa.array([0.0]),
                    "blanc": pa.array([0.0]),
                }
            )
        )
    rc = _cell_sum(cont, _comb2)
    pl = _axis_reduce(cont, "pred", _comb2)
    gl = _axis_reduce(cont, "gold", _comb2)
    t = n_items * (n_items - 1) / 2.0
    rn = t - pl - gl + rc

    def _f1(p: float, r: float) -> float:
        return 2 * p * r / (p + r) if p + r else 0.0

    f_link = _f1(rc / pl if pl else 0.0, rc / gl if gl else 0.0)
    f_non = _f1(
        rn / (t - pl) if t != pl else 0.0,
        rn / (t - gl) if t != gl else 0.0,
    )
    if pl == 0 and gl == 0:
        b = f_non
    elif pl == t and gl == t:
        b = f_link
    else:
        b = (f_link + f_non) / 2.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "rc_links": pa.array([int(rc)], type=pa.int64()),
                "rn_nonlinks": pa.array([int(rn)], type=pa.int64()),
                "pred_links": pa.array([int(pl)], type=pa.int64()),
                "gold_links": pa.array([int(gl)], type=pa.int64()),
                "f_link": pa.array([round(f_link, 6)]),
                "f_non": pa.array([round(f_non, 6)]),
                "blanc": pa.array([round(b, 6)]),
            }
        )
    )


def muc(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, n_cells, n_pred, n_gold,
    muc_precision, muc_recall, muc_f1): the MUC link-based
    clustering metric (Vilain et al., MUC-6 1995) of a predicted
    clustering against gold labels — the third classic ER/coreference
    cluster metric alongside B³ and pairwise F1 (B³ over-rewards
    singletons, pairwise over-weights big clusters; MUC counts the
    minimum spanning links a partition must break).

    Identity: when every evaluated item carries both labels (our
    contract — `_contingency` drops null-labeled rows), the MUC sums
    collapse to four contingency-table cardinalities.  With C the
    number of non-empty contingency CELLS, P/G the number of distinct
    predicted/gold clusters and N the item count:

        recall    = sum_g (n_g - p(g)) / sum_g (n_g - 1)
                  = (N - C) / (N - G)
        precision = (N - C) / (N - P)     (symmetrically)

    because sum_g n_g = N and sum_g p(g) (the number of predicted
    clusters each gold cluster is split across) telescopes to the
    total cell count C.  All four terms are exact integers, so the
    float divisions match a SQL oracle's double arithmetic exactly.

    Degenerate edges: a partition of all singletons has N == P (or
    N == G) and zero links to get right — that side is defined as
    1.0 when the numerator is also 0 (identical trivial partitions)
    else 0.0.

    Scale shape: shared with bcubed (`_contingency`); C and N are one
    pass over the bounded contingency set, P and G are the bucketed
    marginal pass with a constant-1 kernel. The driver receives four
    scalars."""
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    if not n_items:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_items": pa.array([0], type=pa.int64()),
                    "n_cells": pa.array([0], type=pa.int64()),
                    "n_pred": pa.array([0], type=pa.int64()),
                    "n_gold": pa.array([0], type=pa.int64()),
                    "muc_precision": pa.array([0.0]),
                    "muc_recall": pa.array([0.0]),
                    "muc_f1": pa.array([0.0]),
                }
            )
        )
    n_cells = int(_cell_sum(cont, _ones))
    n_pred = int(_axis_reduce(cont, "pred", _ones))
    n_gold = int(_axis_reduce(cont, "gold", _ones))
    num = n_items - n_cells
    prec = (
        num / (n_items - n_pred)
        if n_items != n_pred
        else (1.0 if num == 0 else 0.0)
    )
    rec = (
        num / (n_items - n_gold)
        if n_items != n_gold
        else (1.0 if num == 0 else 0.0)
    )
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "n_cells": pa.array([n_cells], type=pa.int64()),
                "n_pred": pa.array([n_pred], type=pa.int64()),
                "n_gold": pa.array([n_gold], type=pa.int64()),
                "muc_precision": pa.array([round(prec, 6)]),
                "muc_recall": pa.array([round(rec, 6)]),
                "muc_f1": pa.array([round(f1, 6)]),
            }
        )
    )


def _hungarian_max(score: np.ndarray) -> float:
    """Maximum-weight one-to-one assignment VALUE of a dense
    (possibly rectangular) nonnegative score matrix (CEAF uses Φ(g*),
    never the matching itself)."""
    total, _ = _hungarian_solve(score)
    return total


def _hungarian_matching(
    score: np.ndarray,
) -> list[tuple[int, int]]:
    """The optimal matching itself: (row, col) pairs of the
    maximum-weight assignment, restricted to REAL cells with strictly
    positive score (a row matched to a zero cell is equivalent to
    unmatched on a nonnegative matrix, so dropping it never changes
    the optimal value). Deterministic for a fixed input matrix."""
    _, pairs = _hungarian_solve(score)
    return [(r, c) for r, c in pairs if score[r, c] > 0.0]


def _hungarian_solve(
    score: np.ndarray,
) -> tuple[float, list[tuple[int, int]]]:
    """Exact Kuhn-Munkres on a dense (possibly rectangular)
    nonnegative score matrix via the O(n^3) shortest-augmenting-path
    potentials formulation (Jonker-Volgenant shape; standard public
    algorithm). Returns (optimal value, matched (row, col) real
    cells)."""
    if score.size == 0:
        return 0.0, []
    # minimization form on a square padded matrix
    nr, nc = score.shape
    n = max(nr, nc)
    cost = np.zeros((n, n), dtype=np.float64)
    cost[:nr, :nc] = -score
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row matched to col j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            for j in range(1, n + 1):
                if not used[j]:
                    if cur[j - 1] < minv[j]:
                        minv[j] = cur[j - 1]
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            used_idx = used
            u[p[used_idx]] += delta
            v[np.flatnonzero(used_idx)] -= delta
            minv[~used_idx] -= delta
            # v[0] drift is irrelevant: only j >= 1 columns are read
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    total = 0.0
    pairs: list[tuple[int, int]] = []
    for j in range(1, n + 1):
        if p[j] >= 1 and p[j] <= nr and j <= nc:
            total += score[p[j] - 1, j - 1]
            pairs.append((int(p[j] - 1), int(j - 1)))
    return float(total), pairs


def ceaf(
    items: "ray.data.Dataset",
    pred_col: str,
    gold_col: str,
    phi: str = "e",
) -> "ray.data.Dataset":
    """-> one-row Dataset (n_items, n_pred, n_gold, phi_star,
    ceaf_precision, ceaf_recall, ceaf_f1): the CEAF
    constrained-entity-alignment metric (Luo, EMNLP 2005) of a
    predicted clustering against gold labels — the last member of the
    coreference canon (MUC / B³ / CEAF / BLANC). Clusters are aligned
    ONE-TO-ONE by the maximum-total-similarity assignment g* over the
    contingency table; with Φ* = sum of the aligned similarities,

        phi="m" (mention-based, φ3 = |C∩K|):
            precision = recall = Φ*/N
        phi="e" (entity-based, φ4 = 2|C∩K|/(|C|+|K|)):
            precision = Φ*/P,  recall = Φ*/G

    Scale shape: the CONTINGENCY reduction is the same distributed
    pass every other metric here shares; the assignment then runs
    driver-side on the dense P×G matrix — CEAF is inherently a
    global-alignment metric, so this stage is bounded by the CLUSTER
    counts, not the item count (fine for evaluation corpora; do not
    point it at a billion-cluster partition — no SQL oracle exists
    for the same reason: optimal assignment is not expressible in
    DuckDB)."""
    if phi not in ("e", "m"):
        raise ValueError("phi must be 'e' or 'm'")
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    if not n_items:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_items": pa.array([0], type=pa.int64()),
                    "n_pred": pa.array([0], type=pa.int64()),
                    "n_gold": pa.array([0], type=pa.int64()),
                    "phi_star": pa.array([0.0]),
                    "ceaf_precision": pa.array([0.0]),
                    "ceaf_recall": pa.array([0.0]),
                    "ceaf_f1": pa.array([0.0]),
                }
            )
        )
    cells = cont.to_pandas()  # bounded by #distinct (pred, gold)
    preds = {k: i for i, k in enumerate(sorted(set(cells["pred"])))}
    golds = {k: i for i, k in enumerate(sorted(set(cells["gold"])))}
    P, G = len(preds), len(golds)
    inter = np.zeros((P, G), dtype=np.float64)
    pi = cells["pred"].map(preds).to_numpy()
    gi = cells["gold"].map(golds).to_numpy()
    nv = cells["n"].to_numpy(dtype=np.float64)
    inter[pi, gi] = nv
    if phi == "m":
        score = inter
    else:
        psz = inter.sum(axis=1, keepdims=True)
        gsz = inter.sum(axis=0, keepdims=True)
        score = np.where(inter > 0, 2.0 * inter / (psz + gsz), 0.0)
    phi_star = _hungarian_max(score)
    if phi == "m":
        prec = rec = phi_star / n_items
    else:
        prec = phi_star / P
        rec = phi_star / G
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "n_pred": pa.array([P], type=pa.int64()),
                "n_gold": pa.array([G], type=pa.int64()),
                "phi_star": pa.array([round(phi_star, 6)]),
                "ceaf_precision": pa.array([round(prec, 6)]),
                "ceaf_recall": pa.array([round(rec, 6)]),
                "ceaf_f1": pa.array([round(f1, 6)]),
            }
        )
    )


def gmd(
    items: "ray.data.Dataset", pred_col: str, gold_col: str
) -> "ray.data.Dataset":
    """-> one-row Dataset: GENERALIZED MERGE DISTANCE (Menestrina,
    Whang & Garcia-Molina, VLDB 2010) of a predicted clustering
    against gold labels — the edit-distance view of partition
    comparison: the minimum total cost of merge/split operations
    transforming pred into gold, computed by the paper's Slice
    schedule (split every pred cluster into its intersections with
    gold — the contingency CELLS — then merge cells into gold
    clusters). Everything is a pure function of the same contingency
    sums the other metrics here use — never of items or operation
    sequences:

    - PAIR costs (fm(x,y) = fs(x,y) = x*y, the paper's headline
      instantiation): split_cost_pairs = P_R - TP is exactly the
      pairwise FP, merge_cost_pairs = P_S - TP exactly the pairwise
      FN, and gmd_pairs = FP + FN is the TRUE minimum over arbitrary
      edit sequences (pytest verifies against a Dijkstra shortest
      path on the weighted partition-edit graph) — the identity the
      paper uses to derive pairwise precision/recall as GMD special
      cases (fs = 0 gives recall's numerator, fm = 0 precision's).
    - UNIT costs (operation count): slice_splits = C - |R| and
      slice_merges = C - |S| with C the number of non-empty cells and
      |R| / |S| the cluster counts; slice_ops is their sum — minimal
      among ALL split-before-merge scripts (any such script passes
      through a common refinement T, costing 2|T| - |R| - |S|,
      minimized at the coarsest one, R meet S = the cells), but NOT
      over arbitrary interleavings: crossing partitions ({ab,cd} vs
      {ac,bd}) reach 2 ops by merge-then-resplit where the schedule
      needs 4. Unit costs violate the paper's cost-function
      condition; pair costs satisfy it. Reported as the canonical
      edit-script length, pytest-pinned against BFS on refinement
      pairs where the classes coincide.

    All six cost outputs are exact integers (float64-exact far beyond
    any real cardinality), so the DuckDB oracle matches bit-for-bit.
    Scale shape: one contingency reduction + two bucketed marginal
    passes per axis + one cell scan; the driver receives scalars.
    """
    cont = _contingency(items, pred_col, gold_col)
    n_items = int(cont.sum("n") or 0)
    if not n_items:
        empty = {
            "n_items": pa.array([0], type=pa.int64()),
            "n_cells": pa.array([0], type=pa.int64()),
            "n_pred": pa.array([0], type=pa.int64()),
            "n_gold": pa.array([0], type=pa.int64()),
            "slice_splits": pa.array([0], type=pa.int64()),
            "slice_merges": pa.array([0], type=pa.int64()),
            "slice_ops": pa.array([0], type=pa.int64()),
            "split_cost_pairs": pa.array([0], type=pa.int64()),
            "merge_cost_pairs": pa.array([0], type=pa.int64()),
            "gmd_pairs": pa.array([0], type=pa.int64()),
        }
        return ray.data.from_arrow(pa.table(empty))
    n_cells = cont.count()
    n_pred = int(_axis_reduce(cont, "pred", _ones))
    n_gold = int(_axis_reduce(cont, "gold", _ones))
    p_r = _axis_reduce(cont, "pred", _comb2)
    p_s = _axis_reduce(cont, "gold", _comb2)
    tp = _cell_sum(cont, _comb2)
    fp = int(p_r - tp)
    fn = int(p_s - tp)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "n_cells": pa.array([n_cells], type=pa.int64()),
                "n_pred": pa.array([n_pred], type=pa.int64()),
                "n_gold": pa.array([n_gold], type=pa.int64()),
                "slice_splits": pa.array(
                    [n_cells - n_pred], type=pa.int64()
                ),
                "slice_merges": pa.array(
                    [n_cells - n_gold], type=pa.int64()
                ),
                "slice_ops": pa.array(
                    [(n_cells - n_pred) + (n_cells - n_gold)],
                    type=pa.int64(),
                ),
                "split_cost_pairs": pa.array([fp], type=pa.int64()),
                "merge_cost_pairs": pa.array([fn], type=pa.int64()),
                "gmd_pairs": pa.array([fp + fn], type=pa.int64()),
            }
        )
    )
