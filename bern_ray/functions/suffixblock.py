"""Suffix-array blocking (Aizawa & Oyama 2005, the "suffix array
blocking" of Christen's ER survey, TKDE 2012 §IV): every record is
keyed by EVERY suffix (length >= ``min_len``) of its blocking field,
records sharing a suffix form a block, and blocks larger than
``max_block`` are purged — high-frequency tails ("...widget") carry
no identifying signal and would cost C(n,2) comparisons. Versus
single-key blocking (the reference's fold-key dictionaries,
normalize.py:168-289) suffix blocking is robust to PREFIX errors and
truncations: "J. Smith & Co" and "Smith & Co" still share every
suffix of the shorter form.

Scale shape (the 100-TB story):
- suffix emission is a zero-copy byte kernel over the Arrow string
  buffer (same idiom as textstats._explode_tokens): one np.repeat /
  arange gather builds ALL suffix strings of a batch without a
  Python row loop. Output volume is O(sum len^2) per record — callers
  block on NAMES/KEYS (tens of bytes), never documents;
- one shuffle keyed on a 63-bit suffix hash (collisions only
  CO-LOCATE: the in-bucket segmentation groups on the real suffix
  bytes), so a block's global membership meets in one bucket;
- purging bounds per-block emission to C(max_block, 2); purged
  blocks/pairs are reported through ``state/counters`` (SURVEY §7.5:
  log what was dropped);
- pair multiplicities partial-combine per bucket (np.unique) before
  the count shuffle, which moves one packed-int64 row per distinct
  (bucket, pair) — the meta-blocking CBS shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.blocking import segment_pairs
from ..state import counters
from .textstats import _as_string_array, _token_h64

_NUM_BUCKETS = 256
_ID_BITS = 31
_ID_MAX = (1 << _ID_BITS) - 1

_PAIR_SCHEMA = pa.schema(
    [
        ("pair", pa.int64()),
        ("partial", pa.int64()),
        ("pair_bucket", pa.int64()),
    ]
)


def _explode_suffixes(
    keys, min_len: int
) -> tuple[np.ndarray, pa.Array]:
    """-> (parent_idx int64 ndarray, suffixes StringArray): one pair
    per suffix of length >= ``min_len`` of each key (nulls -> no
    suffixes). All suffixes of one string have distinct lengths, so
    per-record suffix strings are automatically distinct — no dedup
    pass needed."""
    arr = _as_string_array(keys)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    empty = (
        np.empty(0, dtype=np.int64),
        pa.array([], type=pa.string()),
    )
    if n == 0:
        return empty
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offs[0] : offs[-1]
    ]
    offs = offs - offs[0]
    lens = np.diff(offs)
    n_suf = np.maximum(lens - min_len + 1, 0)
    total_suf = int(n_suf.sum())
    if total_suf == 0:
        return empty
    parent = np.repeat(np.arange(n, dtype=np.int64), n_suf)
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_suf, out=cum[1:])
    # within-row suffix index k = 0..n_suf-1 (suffix starts at byte k)
    k = np.arange(total_suf, dtype=np.int64) - np.repeat(
        cum[:-1], n_suf
    )
    suf_start = offs[parent] + k
    suf_len = lens[parent] - k
    total_chars = int(suf_len.sum())
    new_offs = np.zeros(total_suf + 1, dtype=np.int64)
    np.cumsum(suf_len, out=new_offs[1:])
    if new_offs[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            "suffix explosion exceeds 2 GiB in one batch; lower the "
            "batch size or raise min_len"
        )
    pos = (
        np.repeat(suf_start - new_offs[:-1], suf_len)
        + np.arange(total_chars)
    )
    suffixes = pa.StringArray.from_buffers(
        total_suf,
        pa.py_buffer(new_offs.astype(np.int32)),
        pa.py_buffer(np.ascontiguousarray(data[pos])),
    )
    return parent, suffixes


def _suf_rows_fn(id_col: str, key_col: str, min_len: int):
    def suf_rows(t: pa.Table) -> pa.Table:
        idx, sufs = _explode_suffixes(t[key_col], min_len)
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False
        )[idx]
        bucket = (
            _token_h64(sufs).astype(np.uint64) % _NUM_BUCKETS
        ).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(
                    ids.astype(np.int64), type=pa.int64()
                ),
                "suf": sufs,
                "bucket": pa.array(bucket),
            }
        )

    return suf_rows


def _emit_bucket_fn(max_block: int):
    """Per suffix-hash bucket: segment on the real suffix bytes,
    purge blocks with size > max_block (counted through the metrics
    sidecar), emit all pairs of survivors and partial-combine pair
    multiplicities before the count shuffle."""

    def emit_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _PAIR_SCHEMA.empty_table()
        suf = g["suf"].to_numpy()
        ids = g["id"].to_numpy(dtype=np.int64)
        if ids.size and int(ids.max()) > _ID_MAX:
            raise ValueError(
                "suffix_blocking ids must fit in 31 bits for the "
                "packed pair key; re-key to dense int64 first"
            )
        order = np.lexsort((ids, suf))
        suf = suf[order]
        ids = ids[order]
        change = np.empty(len(suf), dtype=bool)
        change[0] = True
        change[1:] = suf[1:] != suf[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(suf)))
        purged = sizes > max_block
        if purged.any():
            ps = sizes[purged].astype(np.int64)
            counters.add_many(
                {
                    "suffixblock_purged_blocks": int(purged.sum()),
                    "suffixblock_purged_pairs": int(
                        (ps * (ps - 1) // 2).sum()
                    ),
                }
            )
        keep = (sizes >= 2) & ~purged
        ai, bi = segment_pairs(starts[keep], sizes[keep], cap=None)
        if ai.size == 0:
            return _PAIR_SCHEMA.empty_table()
        # within a block ids are sorted and distinct -> a < b
        pair = (ids[ai] << _ID_BITS) | ids[bi]
        uniq, cnt = np.unique(pair, return_counts=True)
        with np.errstate(over="ignore"):
            pb = (
                uniq.astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(40)
            ) % _NUM_BUCKETS
        return pa.table(
            {
                "pair": pa.array(uniq, type=pa.int64()),
                "partial": pa.array(
                    cnt.astype(np.int64), type=pa.int64()
                ),
                "pair_bucket": pa.array(pb.astype(np.int64)),
            }
        )

    return emit_bucket


def _reduce_pairs(g: pd.DataFrame) -> pa.Table:
    """Sum per-bucket partials per packed pair (sort + reduceat) and
    unpack — the pair's total shared-suffix count."""
    pairk = g["pair"].to_numpy(dtype=np.int64)
    part = g["partial"].to_numpy(dtype=np.int64)
    if pairk.size == 0:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
            }
        )
    order = np.argsort(pairk, kind="stable")
    pairk = pairk[order]
    part = part[order]
    change = np.empty(pairk.size, dtype=bool)
    change[0] = True
    change[1:] = pairk[1:] != pairk[:-1]
    starts = np.flatnonzero(change)
    cnt = np.add.reduceat(part, starts)
    uniq = pairk[starts]
    return pa.table(
        {
            "id_a": pa.array(uniq >> _ID_BITS, type=pa.int64()),
            "id_b": pa.array(uniq & _ID_MAX, type=pa.int64()),
            "n_shared": pa.array(
                cnt.astype(np.int64), type=pa.int64()
            ),
        }
    )


def suffix_blocking(
    records: "ray.data.Dataset",
    id_col: str,
    key_col: str,
    *,
    min_len: int = 5,
    max_block: int = 40,
) -> "ray.data.Dataset":
    """-> Dataset (id_a, id_b, n_shared), id_a < id_b: the candidate
    pairs of suffix-array blocking over ``key_col`` — records sharing
    at least one suffix of length >= ``min_len`` whose block has
    2..``max_block`` members — with ``n_shared`` the number of shared
    surviving suffix blocks (the CBS-style weight downstream pruning
    can threshold on). ``id_col`` must be int64 ids < 2^31."""
    return (
        records.map_batches(
            _suf_rows_fn(id_col, key_col, min_len),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_emit_bucket_fn(max_block), batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(_reduce_pairs, batch_format="pandas")
    )
