"""Table profiling: per-column null / distinct / min / max rollup.

The data-quality census every ingest pipeline runs before trusting a
new source (the shape of pandas-profiling / Deequ's analyzers, recast
as two Ray Data shuffles):

- stats pass: each batch reduces to ONE row per column (n, nulls,
  min, max) — mergeable partials into a tiny groupby, the
  `source_quality` idiom.
- distinct pass: each batch emits its in-batch-unique (column, value)
  keys only (pre-reduction, the token_freq idiom), one hash-bucketed
  shuffle makes them globally unique, per-bucket per-column counts
  fold into the same tiny groupby. Exact — the scale-relief twin for
  wide/high-cardinality columns is the HLL sketch
  (functions/sketch.py hll_*), which replaces the wide shuffle with
  KB-sized mergeable bitmaps.

Output is null-free for the value-hash gate: numeric columns carry
(min_num, max_num) with '' strings; string columns carry lexicographic
(min_str, max_str) with 0.0 numerics; timestamps profile as epoch
microseconds (exact in double).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..stages.bucketed import bucketed_apply
from ..stages.join import bucket_join


def column_overlap(
    ds_a: "ray.data.Dataset",
    col_a: str,
    ds_b: "ray.data.Dataset",
    col_b: str,
    label: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distinct-value overlap between two int64 columns (possibly of
    different tables): |A|, |B|, |A∩B| and the Jaccard — the
    schema-matching / join-key-discovery primitive (a high overlap
    says "these columns join"; Deequ/Metanome's inclusion-dependency
    census shape).

    One shuffle, no join: each side emits its in-batch-distinct
    values tagged 1 (left) or 2 (right); a groupby(value) reduces to
    (min_tag, max_tag) per GLOBALLY distinct value — present-in-both
    iff min=1 and max=2 — and per-batch membership counts fold into
    an O(1)-row result. Ships one row per distinct (value, side) per
    batch, never a pair inventory."""

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            col = col_a if side == 1 else col_b
            v = np.unique(t[col].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "v": pa.array(v, type=pa.int64()),
                    "m": pa.array(
                        np.full(len(v), side, dtype=np.int64)
                    ),
                }
            )

        return fn

    tagged = ds_a.map_batches(tag(1), batch_format="pyarrow").union(
        ds_b.map_batches(tag(2), batch_format="pyarrow")
    )
    per_value = tagged.groupby("v").aggregate(
        Min("m", alias_name="mn"), Max("m", alias_name="mx")
    )

    def counts(t: pa.Table) -> pa.Table:
        mn = t["mn"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        both = int(((mn == 1) & (mx == 2)).sum())
        a_only = int((mx == 1).sum())
        b_only = int((mn == 2).sum())
        return pa.table(
            {
                "pair": pa.array([label], type=pa.string()),
                "pa_": pa.array([a_only + both], type=pa.int64()),
                "pb_": pa.array([b_only + both], type=pa.int64()),
                "pboth": pa.array([both], type=pa.int64()),
                "pu": pa.array(
                    [a_only + b_only + both], type=pa.int64()
                ),
            }
        )

    agg = (
        per_value.map_batches(counts, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(
            Sum("pa_", alias_name="pa_"),
            Sum("pb_", alias_name="pb_"),
            Sum("pboth", alias_name="pboth"),
            Sum("pu", alias_name="pu"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "pair": t["pair"],
                "n_a": pc.cast(t["pa_"], pa.int64()),
                "n_b": pc.cast(t["pb_"], pa.int64()),
                "n_both": pc.cast(t["pboth"], pa.int64()),
                "jaccard": pa.array(
                    np.round(
                        t["pboth"].to_numpy(zero_copy_only=False)
                        / t["pu"].to_numpy(zero_copy_only=False),
                        6,
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )


def profile_table(
    ds: "ray.data.Dataset",
    num_cols: list[str],
    str_cols: list[str],
    ts_cols: list[str] | None = None,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    ts_cols = ts_cols or []
    all_cols = list(num_cols) + list(ts_cols) + list(str_cols)

    def _num_arr(t: pa.Table, c: str) -> pa.Array:
        arr = t[c]
        if c in ts_cols:
            # epoch MICROseconds whatever the input precision (the
            # oracle's epoch_us; ~1.7e15 for current dates — exact in
            # float64, unlike nanos which overflow the 2^53 window)
            arr = pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
        return pc.cast(arr, pa.float64())

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in num_cols + ts_cols:
            arr = _num_arr(t, c)
            mm = pc.min_max(arr)
            rows.append(
                {
                    "col": c,
                    "n_rows": t.num_rows,
                    "n_null": t[c].null_count,
                    "min_num": mm["min"].as_py(),
                    "max_num": mm["max"].as_py(),
                    "min_str": None,
                    "max_str": None,
                }
            )
        for c in str_cols:
            mm = pc.min_max(t[c])
            rows.append(
                {
                    "col": c,
                    "n_rows": t.num_rows,
                    "n_null": t[c].null_count,
                    "min_num": None,
                    "max_num": None,
                    "min_str": mm["min"].as_py(),
                    "max_str": mm["max"].as_py(),
                }
            )
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum("n_rows"),
            Sum("n_null"),
            Min("min_num"),
            Max("max_num"),
            Min("min_str"),
            Max("max_str"),
        )
    )

    def distinct_partial(t: pa.Table) -> pa.Table:
        keys: list[pa.Array] = []
        for c in all_cols:
            if c in str_cols:
                vals = t[c].drop_null().unique()
                vs = pc.cast(vals, pa.string())
            else:
                a = _num_arr(t, c).drop_null()
                u = np.unique(a.to_numpy(zero_copy_only=False))
                vs = pa.array(u.astype(str), type=pa.string())
            if len(vs):
                keys.append(
                    pc.binary_join_element_wise(
                        pa.array([c] * len(vs), type=pa.string()), vs, "\x01"
                    )
                )
        if not keys:
            return pa.table({"k": pa.array([], type=pa.string())})
        return pa.table({"k": pa.concat_arrays([pc.cast(k, pa.string()) for k in keys])})

    def distinct_count_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "col": pa.array([], type=pa.string()),
                    "nd_partial": pa.array([], type=pa.int64()),
                }
            )
        ks = np.unique(np.asarray(t["k"].to_pylist(), dtype=object))
        cols = np.asarray(
            [k.split("\x01", 1)[0] for k in ks], dtype=object
        )
        u, c = np.unique(cols, return_counts=True)
        return pa.table(
            {
                "col": pa.array(list(u), type=pa.string()),
                "nd_partial": pa.array(c.astype(np.int64)),
            }
        )

    nd = (
        bucketed_apply(
            ds.map_batches(distinct_partial, batch_format="pyarrow"),
            "k",
            distinct_count_bucket,
            num_buckets=num_buckets,
        )
        .groupby("col")
        .sum("nd_partial")
    )

    def key_stats(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["col"].to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(h),
                "col": t["col"],
                "n_rows": t["sum(n_rows)"],
                "n_null": t["sum(n_null)"],
                "min_num": t["min(min_num)"],
                "max_num": t["max(max_num)"],
                "min_str": t["min(min_str)"],
                "max_str": t["max(max_str)"],
            }
        )

    def key_nd(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["col"].to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {
                "rh": pa.array(h),
                "r_col": t["col"],
                "n_distinct": t["sum(nd_partial)"],
            }
        )

    joined = bucket_join(
        stats.map_batches(key_stats, batch_format="pyarrow"),
        nd.map_batches(key_nd, batch_format="pyarrow"),
        left_on="h",
        right_on="rh",
        left_schema={
            "h": pa.int64(),
            "col": pa.string(),
            "n_rows": pa.int64(),
            "n_null": pa.int64(),
            "min_num": pa.float64(),
            "max_num": pa.float64(),
            "min_str": pa.string(),
            "max_str": pa.string(),
        },
        right_schema={
            "rh": pa.int64(),
            "r_col": pa.string(),
            "n_distinct": pa.int64(),
        },
        num_buckets=8,
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["col"], t["r_col"]))
        return pa.table(
            {
                "col": t["col"],
                "n_rows": pc.cast(t["n_rows"], pa.int64()),
                "n_null": pc.cast(t["n_null"], pa.int64()),
                "n_distinct": pc.cast(t["n_distinct"], pa.int64()),
                "min_num": pc.fill_null(t["min_num"], 0.0),
                "max_num": pc.fill_null(t["max_num"], 0.0),
                "min_str": pc.fill_null(t["min_str"], ""),
                "max_str": pc.fill_null(t["max_str"], ""),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
