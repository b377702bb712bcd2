"""Term-frequency adjustments for the Fellegi-Sunter model.

The plain FS model (functions/fellegi.py) gives every agreement on a
field the SAME weight log2(m/u). On a skewed field that is wrong in
both directions: two records agreeing on a COMMON value (half the
corpus lives in one nation) carry much weaker match evidence than two
agreeing on a RARE one. The standard production fix — Splink's
``tf_adjustments``, after Winkler 1988's value-specific frequencies —
replaces the field-level u with a value-specific u for agreeing pairs:
u_v = tf(v), the value's corpus share, because two non-matches drawn
independently both carry value v with probability ~tf(v)^2 given one
of them does with tf(v). The adjusted agreement weight on value v is

    w_adj(v) = log2(m / u) + log2(u / tf(v))  ( = log2(m / tf(v)) )

i.e. the learned field weight plus a value-rarity correction that is
positive for rare values and negative for common ones; the corrections
average out to ~0 under the u-distribution, so the field-level model
is the expectation of the adjusted one.

Applies to EXACT-equality fields (nation, segment here) — a fuzzy
agreement (name JW) has no single shared value to look up, which is
the same restriction Splink documents.

Scale shape: term frequencies are per-batch value-count partials into
a tiny groupby (distinct-value-sized, like token_freq); EM runs on the
<=2^k pattern table exactly as in fellegi.py; the adjustment table is
O(distinct values of the adjusted fields) — 30 rows here — and the
one driver hop is that table, same contract as the sketch family.
Reference analog: the reference's dictionary normalizers weight every
exact dictionary hit equally (normalize.py:168-289); TF adjustment is
the corpus-aware refinement of exactly that rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .fellegi import (
    FS_INIT_LAMBDA,
    FS_INIT_M,
    FS_INIT_U,
    FS_ITERS,
    _collect_counts,
    _em_fit,
    _pattern_arrays,
)


def _value_counts(
    ds: "ray.data.Dataset", col: str
) -> "ray.data.Dataset":
    """Distributed (value, n) counts: per-batch value-count partials
    into one distinct-value-sized groupby — the token_freq idiom."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "value": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        import pyarrow.compute as pc

        vc = pc.value_counts(t[col].cast(pa.string()))
        return pa.table(
            {
                "value": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["value", "n"]),
            batch_format="pyarrow",
        )
    )


def fs_tf_table(
    pattern_counts: pa.Table,
    field_values: dict[str, pa.Table],
    *,
    iters: int = FS_ITERS,
    init_lambda: float = FS_INIT_LAMBDA,
    init_m: float = FS_INIT_M,
    init_u: float = FS_INIT_U,
) -> pa.Table:
    """The per-value adjustment table, driver-side on bounded inputs.

    ``pattern_counts`` is the (g_name, g_nation, g_segment, n_pairs)
    contingency table; ``field_values`` maps adjusted field name
    ('nation' | 'segment' — position 2 and 3 of the comparison
    vector) to its (value, n) corpus counts. Output rows:

      (field, value, tf, base_weight, tf_adj, adj_weight)

    with tf = n / N over that field's counts, base_weight =
    log2(m_f / u_f) from the UNROUNDED EM fixed point, tf_adj =
    log2(u_f / tf), adj_weight = base_weight + tf_adj (left-assoc —
    the SQL mirror adds the same two doubles). Floats rounded to 6dp
    (the gate's shared rule); rows ordered (field, value).
    """
    g, n = _pattern_arrays(pattern_counts)
    lam, m, u = _em_fit(
        g,
        n,
        iters=iters,
        init_lambda=init_lambda,
        init_m=init_m,
        init_u=init_u,
    )
    field_pos = {"name": 0, "nation": 1, "segment": 2}

    fields: list[str] = []
    values: list[str] = []
    tfs: list[float] = []
    bases: list[float] = []
    adjs: list[float] = []
    weights: list[float] = []
    for fname in sorted(field_values):
        pos = field_pos[fname]
        vt = field_values[fname]
        vals = vt["value"].to_pylist()
        cnt = vt["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(np.asarray(vals, dtype=object))
        total = float(cnt.sum())
        base = float(np.log2(m[pos] / u[pos]))
        for i in order:
            tf = cnt[i] / total
            adj = float(np.log2(u[pos] / tf))
            fields.append(fname)
            values.append(vals[i])
            tfs.append(tf)
            bases.append(base)
            adjs.append(adj)
            weights.append(base + adj)
    return pa.table(
        {
            "field": pa.array(fields, type=pa.string()),
            "value": pa.array(values, type=pa.string()),
            "tf": pa.array(
                [round(x, 6) for x in tfs], type=pa.float64()
            ),
            "base_weight": pa.array(
                [round(x, 6) for x in bases], type=pa.float64()
            ),
            "tf_adj": pa.array(
                [round(x, 6) for x in adjs], type=pa.float64()
            ),
            "adj_weight": pa.array(
                [round(x, 6) for x in weights], type=pa.float64()
            ),
        }
    )


def fs_tf_adjustments(
    pattern_counts: "ray.data.Dataset",
    corpus: "ray.data.Dataset",
    *,
    fields: dict[str, str],
    iters: int = FS_ITERS,
) -> pa.Table:
    """Distributed ends, bounded middle: collect the <=2^k pattern
    table and each adjusted field's distinct-value counts (both
    O(model), never O(rows)), then build the adjustment table.

    ``fields`` maps comparison-vector field name -> corpus column,
    e.g. {'nation': 'c_nationkey', 'segment': 'c_mktsegment'}.
    """
    counts = _collect_counts(pattern_counts)
    field_values: dict[str, pa.Table] = {}
    for fname, col in fields.items():
        rows = _value_counts(corpus, col).take_all()
        field_values[fname] = pa.table(
            {
                "value": pa.array(
                    [r["value"] for r in rows], type=pa.string()
                ),
                "n": pa.array([r["n"] for r in rows], type=pa.int64()),
            }
        )
    return fs_tf_table(counts, field_values, iters=iters)


def fs_tf_sql(
    pairs_cte: str,
    field_sources: dict[str, tuple[str, int]],
    *,
    iters: int = FS_ITERS,
    init_lambda: float = FS_INIT_LAMBDA,
    init_m: float = FS_INIT_M,
    init_u: float = FS_INIT_U,
) -> str:
    """DuckDB oracle: the unrolled EM chain (shared generator), a
    value-count CTE per adjusted field, and the adjustment arithmetic
    replayed with the same association as fs_tf_table.

    ``field_sources`` maps field name -> (SQL producing (value, n)
    counts for that field, comparison-vector position 1..3 selecting
    m{i}/u{i}).
    """
    from .fellegi import _em_chain_ctes

    body = _em_chain_ctes(iters, init_lambda, init_m, init_u)
    tf_ctes = []
    selects = []
    for fname in sorted(field_sources):
        src, pos = field_sources[fname]
        cte = f"tf_{fname}"
        tf_ctes.append(f"{cte} AS MATERIALIZED ({src})")
        tot = f"(SELECT SUM(n) FROM {cte})"
        selects.append(
            f"""SELECT '{fname}' AS field, t.value,
       round(t.n / {tot}, 6) AS tf,
       round(log2(i.m{pos} / i.u{pos}), 6) AS base_weight,
       round(log2(i.u{pos} / (t.n / {tot})), 6) AS tf_adj,
       round(log2(i.m{pos} / i.u{pos})
             + log2(i.u{pos} / (t.n / {tot})), 6) AS adj_weight
FROM {cte} t, it{iters} i"""
        )
    ctes = ",\n".join(tf_ctes)
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH pairs AS MATERIALIZED ({pairs_cte}),
pat AS MATERIALIZED (
  SELECT g_name AS g1, g_nation AS g2, g_segment AS g3,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM pairs GROUP BY 1, 2, 3
),
{body},
{ctes}
{union}
ORDER BY field, value
"""
