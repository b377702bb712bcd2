"""Fellegi-Sunter unsupervised record-linkage weights via EM.

The classic probabilistic record-linkage model (Fellegi & Sunter 1969;
the Splink/FEBRL execution shape): each blocked candidate pair is
reduced to a comparison vector gamma of k binary field agreements, the
corpus is summarized as the 2^k-pattern contingency table, and EM fits
a two-class mixture — match prevalence ``lambda`` plus per-field
agreement probabilities ``m_i = P(gamma_i = 1 | match)`` and
``u_i = P(gamma_i = 1 | non-match)``. The per-field log2(m/u) match
weights are the learned scoring rule.

Reference analog: the reference scores mention pairs with FIXED
hand-set rules (normalize.py:168-289 score duel; dictionary lookups are
the similarity-1.0 degenerate case). Fellegi-Sunter is the standard
UNSUPERVISED way to learn those weights from the corpus itself — the
missing third leg next to the frozen rule ensemble (stages/scoring.py)
and the trained logistic seam (scripts/train_pair_model.py).

Scale shape (the part that matters at 100 TB):
  1. candidate pairs come from the same distributed blocked join the
     fuzzy-join family uses (bucket_join on a block key) — no driver
     pair inventory;
  2. each scoring batch collapses IMMEDIATELY to a bincount over the
     2^k patterns (a fixed-size mergeable partial, exactly like the
     sketch family in functions/sketch.py) — the shuffle moves at most
     2^k rows per batch regardless of corpus size;
  3. EM runs driver-side on the final 2^k-row table: O(2^k * iters)
     floating-point work, INDEPENDENT of corpus size. This is the same
     design Splink uses against billion-row backends.

Determinism: fixed init, fixed iteration count, float64 throughout,
patterns processed in ascending order — the DuckDB oracle mirrors the
EM as an unrolled CTE chain (one CTE per iteration) and the gate
matches values after the shared round-6 rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..core.similarity import jaro_winkler
from ..stages.join import bucket_join

# fixed EM hyper-parameters shared by the Ray path, the pytest
# reference and the SQL oracle generator (fs_em_sql) — change together.
FS_INIT_LAMBDA = 0.1
FS_INIT_M = 0.9
FS_INIT_U = 0.1
FS_ITERS = 20


def fs_pattern_counts(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    block_fn,
    jw_threshold: float = 0.96,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Contingency table of comparison patterns over blocked pairs.

    ``left`` carries (l_id, l_name, l_nation, l_segment); ``right``
    carries (r_id, r_name, r_nation, r_segment). Same-block pairs
    (``block_fn`` over the name, as in functions/fuzzyjoin.py) are
    compared on three fields — name Jaro-Winkler >= ``jw_threshold``,
    nation equality, segment equality — and counted by pattern.

    Returns (g_name, g_nation, g_segment, n_pairs): at most 8 rows.
    Each map batch emits its own <=8-row bincount partial, so the
    groupby shuffles O(8 * num_blocks_of_batches) tiny rows, never the
    pairs themselves.
    """

    def tag(name_col: str):
        def fn(t: pa.Table) -> pa.Table:
            names = t[name_col].to_pylist()
            return t.append_column(
                "bk", pa.array(block_fn(names), type=pa.int64())
            )

        return fn

    lt = left.map_batches(tag("l_name"), batch_format="pyarrow")
    rt = right.map_batches(tag("r_name"), batch_format="pyarrow")
    cand = bucket_join(
        lt,
        rt,
        left_on="bk",
        right_on="bk",
        left_schema={
            "bk": pa.int64(),
            "l_id": pa.int64(),
            "l_name": pa.string(),
            "l_nation": pa.int64(),
            "l_segment": pa.string(),
        },
        right_schema={
            "bk": pa.int64(),
            "r_id": pa.int64(),
            "r_name": pa.string(),
            "r_nation": pa.int64(),
            "r_segment": pa.string(),
        },
        num_buckets=num_buckets,
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g_name": pa.array([], type=pa.int64()),
                    "g_nation": pa.array([], type=pa.int64()),
                    "g_segment": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        jw = jaro_winkler(
            t["l_name"].to_pylist(), t["r_name"].to_pylist()
        )
        g_name = (jw >= jw_threshold).astype(np.int64)
        g_nation = (
            t["l_nation"].to_numpy(zero_copy_only=False)
            == t["r_nation"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        g_segment = np.asarray(
            [
                a == b
                for a, b in zip(
                    t["l_segment"].to_pylist(),
                    t["r_segment"].to_pylist(),
                )
            ],
            dtype=np.int64,
        )
        pattern = g_name * 4 + g_nation * 2 + g_segment
        counts = np.bincount(pattern, minlength=8)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "g_name": pa.array(nz // 4, type=pa.int64()),
                "g_nation": pa.array((nz // 2) % 2, type=pa.int64()),
                "g_segment": pa.array(nz % 2, type=pa.int64()),
                "n": pa.array(counts[nz], type=pa.int64()),
            }
        )

    partials = cand.map_batches(partial_counts, batch_format="pyarrow")
    agg = partials.groupby(["g_name", "g_nation", "g_segment"]).sum("n")
    return agg.map_batches(
        lambda t: t.rename_columns(
            ["g_name", "g_nation", "g_segment", "n_pairs"]
        ),
        batch_format="pyarrow",
    )


def fs_em(
    counts: pa.Table,
    *,
    iters: int = FS_ITERS,
    init_lambda: float = FS_INIT_LAMBDA,
    init_m: float = FS_INIT_M,
    init_u: float = FS_INIT_U,
) -> pa.Table:
    """EM over a (g_name, g_nation, g_segment, n_pairs) pattern table.

    Driver-side by design: the input is at most 2^k rows whatever the
    corpus size (see module docstring). Patterns are sorted ascending
    before the loop so the floating-point reduction order is fixed.

    Precondition (holds for any non-degenerate corpus): every
    iteration keeps both mixture masses positive — callers feeding
    adversarially tiny inputs should expect NaNs, matching the SQL
    oracle's behavior rather than hiding it behind clamps.

    Returns tidy (param, value) rows: 'lambda' plus m_/u_/weight_ per
    field, value rounded to 6dp (the gate's shared float rule);
    weight_f = log2(m_f / u_f), the Fellegi-Sunter agreement weight.
    """
    fields = ("name", "nation", "segment")
    g = np.stack(
        [
            counts["g_name"].to_numpy(zero_copy_only=False),
            counts["g_nation"].to_numpy(zero_copy_only=False),
            counts["g_segment"].to_numpy(zero_copy_only=False),
        ],
        axis=1,
    ).astype(np.float64)
    n = counts["n_pairs"].to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    order = np.lexsort((g[:, 2], g[:, 1], g[:, 0]))
    g, n = g[order], n[order]

    lam = float(init_lambda)
    m = np.full(3, float(init_m))
    u = np.full(3, float(init_u))
    for _ in range(iters):
        pm = np.prod(np.where(g == 1.0, m, 1.0 - m), axis=1)
        pu = np.prod(np.where(g == 1.0, u, 1.0 - u), axis=1)
        wm = lam * pm
        wu = (1.0 - lam) * pu
        post = wm / (wm + wu)
        mm = np.sum(n * post)
        uu = np.sum(n * (1.0 - post))
        lam = mm / (mm + uu)
        m = (n * post) @ g / mm
        u = (n * (1.0 - post)) @ g / uu

    params = ["lambda"]
    values = [lam]
    for i, f in enumerate(fields):
        params += [f"m_{f}", f"u_{f}", f"weight_{f}"]
        values += [m[i], u[i], float(np.log2(m[i] / u[i]))]
    order2 = np.argsort(np.asarray(params, dtype=object))
    return pa.table(
        {
            "param": pa.array(
                [params[i] for i in order2], type=pa.string()
            ),
            "value": pa.array(
                [round(float(values[i]), 6) for i in order2],
                type=pa.float64(),
            ),
        }
    )


def fs_em_weights(
    pattern_counts: "ray.data.Dataset",
    *,
    iters: int = FS_ITERS,
) -> pa.Table:
    """Collect the <=8-row pattern table and run the EM. The take_all
    is O(2^k) by construction — the one driver hop this operator is
    ALLOWED, same contract as the sketch family's merged registers."""
    rows = pattern_counts.take_all()
    counts = pa.table(
        {
            "g_name": pa.array(
                [r["g_name"] for r in rows], type=pa.int64()
            ),
            "g_nation": pa.array(
                [r["g_nation"] for r in rows], type=pa.int64()
            ),
            "g_segment": pa.array(
                [r["g_segment"] for r in rows], type=pa.int64()
            ),
            "n_pairs": pa.array(
                [r["n_pairs"] for r in rows], type=pa.int64()
            ),
        }
    )
    return fs_em(counts, iters=iters)


def fs_em_sql(
    pairs_cte: str,
    *,
    iters: int = FS_ITERS,
    init_lambda: float = FS_INIT_LAMBDA,
    init_m: float = FS_INIT_M,
    init_u: float = FS_INIT_U,
) -> str:
    """DuckDB oracle for the EM: one CTE per iteration, mechanically
    unrolled. ``pairs_cte`` must SELECT g_name, g_nation, g_segment
    (ints) per candidate pair; the chain aggregates them to the
    pattern table and replays the exact update equations of fs_em.
    """
    # every chain CTE is MATERIALIZED: DuckDB otherwise inlines each
    # it{k} into its consumers and the nested re-evaluation of the
    # chain turns 20 iterations into minutes even on an 8-row pattern
    # table (measured: 503 s at sf0.001 inlined, <0.1 s materialized).
    its = [
        f"it0 AS MATERIALIZED (SELECT {init_lambda} AS lam,"
        + ", ".join(
            f" {init_m} AS m{i}, {init_u} AS u{i}" for i in (1, 2, 3)
        )
        + ")"
    ]
    for k in range(1, iters + 1):
        prev = f"it{k - 1}"
        post = (
            "(i.lam"
            " * (CASE WHEN p.g1 = 1 THEN i.m1 ELSE 1 - i.m1 END)"
            " * (CASE WHEN p.g2 = 1 THEN i.m2 ELSE 1 - i.m2 END)"
            " * (CASE WHEN p.g3 = 1 THEN i.m3 ELSE 1 - i.m3 END))"
            " / ((i.lam"
            " * (CASE WHEN p.g1 = 1 THEN i.m1 ELSE 1 - i.m1 END)"
            " * (CASE WHEN p.g2 = 1 THEN i.m2 ELSE 1 - i.m2 END)"
            " * (CASE WHEN p.g3 = 1 THEN i.m3 ELSE 1 - i.m3 END))"
            " + ((1 - i.lam)"
            " * (CASE WHEN p.g1 = 1 THEN i.u1 ELSE 1 - i.u1 END)"
            " * (CASE WHEN p.g2 = 1 THEN i.u2 ELSE 1 - i.u2 END)"
            " * (CASE WHEN p.g3 = 1 THEN i.u3 ELSE 1 - i.u3 END)))"
        )
        upd = [
            "SUM(n * post) / SUM(n) AS lam",
        ]
        for i in (1, 2, 3):
            upd.append(
                f"SUM(n * post * g{i}) / SUM(n * post) AS m{i}"
            )
            upd.append(
                f"SUM(n * (1 - post) * g{i})"
                f" / SUM(n * (1 - post)) AS u{i}"
            )
        its.append(
            f"it{k} AS MATERIALIZED (SELECT " + ", ".join(upd) + f"""
  FROM (SELECT p.n, p.g1, p.g2, p.g3, {post} AS post
        FROM pat p, {prev} i))"""
        )
    fields = {"1": "name", "2": "nation", "3": "segment"}
    outs = [f"SELECT 'lambda' AS param, lam AS value FROM it{iters}"]
    for i, f in fields.items():
        outs.append(f"SELECT 'm_{f}', m{i} FROM it{iters}")
        outs.append(f"SELECT 'u_{f}', u{i} FROM it{iters}")
        outs.append(
            f"SELECT 'weight_{f}', log2(m{i} / u{i}) FROM it{iters}"
        )
    body = ",\n".join(its)
    union = "\nUNION ALL ".join(outs)
    return f"""
WITH pairs AS MATERIALIZED ({pairs_cte}),
pat AS MATERIALIZED (
  SELECT g_name AS g1, g_nation AS g2, g_segment AS g3,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM pairs GROUP BY 1, 2, 3
),
{body}
SELECT param, round(value, 6) AS value FROM ({union})
ORDER BY param
"""
