"""Change-data-capture operators: snapshot diff and delta apply.

``snapshot_diff`` classifies every key of two keyed snapshots as
insert / delete / update by a single full-outer bucketed shuffle
(stages/join.py): each side ships (key, compared columns) exactly
once, the per-bucket merge null-fills the missing side, and the
classification + unchanged-row drop happen inside the same
map_batches — emission is bounded by the churn, never the table.

Scale shape (100 TB): for wide rows the caller should pre-reduce the
compared columns to a map-side content digest so only
(key, digest, output-carry columns) ride the shuffle; for the narrow
oracle-checked queries here the compared columns ride directly, which
keeps the comparison EXACT (no digest-collision caveat — cf. the
ADVICE note on fuzzyjoin.suffix_digits_block). Reference analog: the
gold-vs-predicted compare loop in run_ner.py:538-581 is the same
keyed two-snapshot diff, there as a driver-side dict walk.

``apply_delta`` is the inverse: snapshot ⊕ delta → next snapshot via
the same outer shuffle (delete drops, update replaces, insert adds),
so diff→apply round-trips — pytest-pinned in tests/test_cdc.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.join import bucket_join

CHANGE_INSERT = "insert"
CHANGE_DELETE = "delete"
CHANGE_UPDATE = "update"


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    *,
    key: str,
    compare: list[str],
    value_type: pa.DataType = pa.int64(),
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Diff two keyed snapshots → (key, change, old_*, new_*) rows.

    ``old`` must carry columns ``[key] + [f"old_{c}"]`` and ``new``
    ``[f"{key}__new"] + [f"new_{c}"]`` for each name in ``compare``
    (disjoint names — the bucket join unions both sides into one
    shuffle). Unchanged keys (all compared columns equal, null-safe)
    are dropped inside the bucket, so the output is churn-sized.
    """
    new_key = f"{key}__new"
    left_schema: dict[str, pa.DataType] = {key: pa.int64()}
    right_schema: dict[str, pa.DataType] = {new_key: pa.int64()}
    for c in compare:
        left_schema[f"old_{c}"] = value_type
        right_schema[f"new_{c}"] = value_type

    joined = bucket_join(
        old,
        new,
        left_on=key,
        right_on=new_key,
        left_schema=left_schema,
        right_schema=right_schema,
        how="outer",
        num_buckets=num_buckets,
    )

    first = f"old_{compare[0]}"

    def classify(t: pa.Table) -> pa.Table:
        ins = pc.is_null(t[first])
        dele = pc.is_null(t[f"new_{compare[0]}"])
        # null-safe per-column inequality: a null on either side is
        # already covered by ins/dele (whole-row presence), so plain
        # not_equal + fill_null(False) is exact here
        neq = None
        for c in compare:
            d = pc.fill_null(
                pc.not_equal(t[f"old_{c}"], t[f"new_{c}"]), False
            )
            neq = d if neq is None else pc.or_(neq, d)
        keep = pc.or_(pc.or_(ins, dele), neq)
        t = t.filter(keep)
        ins = pc.is_null(t[first])
        dele = pc.is_null(t[f"new_{compare[0]}"])
        change = pc.if_else(
            ins,
            pa.scalar(CHANGE_INSERT),
            pc.if_else(
                dele, pa.scalar(CHANGE_DELETE), pa.scalar(CHANGE_UPDATE)
            ),
        )
        cols: dict = {key: t[key], "change": change}
        for c in compare:
            cols[f"old_{c}"] = t[f"old_{c}"]
            cols[f"new_{c}"] = t[f"new_{c}"]
        return pa.table(cols)

    return joined.map_batches(classify, batch_format="pyarrow")


def apply_delta(
    snapshot: "ray.data.Dataset",
    delta: "ray.data.Dataset",
    *,
    key: str,
    values: list[str],
    value_type: pa.DataType = pa.int64(),
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """snapshot ⊕ diff rows → next snapshot (one outer shuffle).

    ``snapshot`` carries ``[key] + values``; ``delta`` carries the
    snapshot_diff output (``key``, ``change``, ``new_*`` columns —
    ``old_*`` are ignored). Deletes drop the row, updates/inserts
    take the delta's ``new_*`` values, untouched keys pass through.
    """
    new_key = f"{key}__d"

    def rekey(t: pa.Table) -> pa.Table:
        cols: dict = {new_key: t[key], "change": t["change"]}
        for c in values:
            cols[f"new_{c}"] = t[f"new_{c}"]
        return pa.table(cols)

    delta2 = delta.map_batches(rekey, batch_format="pyarrow")
    left_schema: dict[str, pa.DataType] = {key: pa.int64()}
    for c in values:
        left_schema[c] = value_type
    right_schema: dict[str, pa.DataType] = {
        new_key: pa.int64(),
        "change": pa.string(),
    }
    for c in values:
        right_schema[f"new_{c}"] = value_type

    joined = bucket_join(
        snapshot,
        delta2,
        left_on=key,
        right_on=new_key,
        left_schema=left_schema,
        right_schema=right_schema,
        how="outer",
        num_buckets=num_buckets,
    )

    def apply(t: pa.Table) -> pa.Table:
        change = t["change"]
        keep = pc.fill_null(
            pc.not_equal(change, pa.scalar(CHANGE_DELETE)), True
        )
        t = t.filter(keep)
        touched = pc.is_valid(t["change"])
        cols: dict = {key: t[key]}
        for c in values:
            cols[c] = pc.if_else(touched, t[f"new_{c}"], t[c])
        return pa.table(cols)

    return joined.map_batches(apply, batch_format="pyarrow")
