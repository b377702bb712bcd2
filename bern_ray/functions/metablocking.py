"""Meta-blocking over token blocking: block purging + common-block
(CBS) comparison pruning.

Token blocking (every record keyed by every distinct token of a
blocking field) is the redundancy-positive scheme the ER literature
builds meta-blocking on (Papadakis et al., "Meta-Blocking: Taking
Entity Resolution to the Next Level", TKDE 2014): oversized blocks
are PURGED (a token shared by half the corpus carries no signal and
would cost C(n,2) comparisons), and the surviving candidate pairs are
PRUNED by edge weight in the blocking graph — here the CBS scheme
(weight = number of blocks two records co-occur in), keeping pairs
with weight >= ``min_common``. This is the literature step beyond the
reference's single-key blocking dictionaries (normalize.py:168-289:
one fold key per mention, no redundancy, no pruning) and composes
with the same downstream scorer/CC stages.

Scale shape (the 100-TB story):
- one token shuffle keyed on a 63-bit token hash (hash collisions
  only co-locate: the in-bucket segmentation groups on the REAL
  token bytes);
- block purging bounds per-block pair emission to C(purge_cap, 2) —
  the cap is the skew defense, and purged blocks/pairs are reported
  through ``state/counters`` (SURVEY §7.5: log what was dropped);
- pair multiplicities are combined per bucket BEFORE the second
  shuffle (np.unique partial), so the CBS shuffle moves one row per
  distinct (bucket, pair), keyed on a packed int64 — never a string;
  the CBS combine itself is bucketed (256 pair-hash groups, one
  vectorized np reduce per group) rather than a native per-key
  groupby — 871k distinct pairs through Ray's groupby().sum() cost
  ~21 s at sf0.01 where the bucketed reduce is sub-second;
- nothing is driver-sized: the output is the pruned pair list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.blocking import segment_pairs
from ..state import counters
from .textstats import _explode_tokens, _token_h64

_NUM_BUCKETS = 256
# packed pair key = (a << 31) | b: both ids must fit in 31 bits so
# the pack stays positive int64 (web-scale corpora with wider ids
# re-key to dense int before linkage, as the linkage pipeline does).
_ID_BITS = 31
_ID_MAX = (1 << _ID_BITS) - 1

_PAIR_SCHEMA = pa.schema(
    [
        ("pair", pa.int64()),
        ("partial", pa.int64()),
        ("pair_bucket", pa.int64()),
    ]
)


def _tok_rows_fn(id_col: str, text_col: str):
    def tok_rows(t: pa.Table) -> pa.Table:
        idx, toks = _explode_tokens(t[text_col])
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False
        )[idx]
        # distinct (id, token): a record lives in exactly one batch,
        # so per-batch dedup IS global dedup
        df = pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "token": toks.to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        tok_arr = pa.array(df["token"], type=pa.string())
        bucket = (
            _token_h64(tok_arr).astype(np.uint64) % _NUM_BUCKETS
        ).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(df["id"].to_numpy(), type=pa.int64()),
                "token": tok_arr,
                "bucket": pa.array(bucket),
            }
        )

    return tok_rows


def _emit_bucket_fn(purge_threshold_x2: int):
    """Per-bucket: segment on the real token, purge blocks with
    2*size > purge_threshold_x2, emit all pairs of survivors, and
    partial-combine pair multiplicities (np.unique) before the CBS
    shuffle. The x2 integer compare keeps a fractional cap (e.g.
    half the corpus) exact — no float boundary."""

    def emit_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _PAIR_SCHEMA.empty_table()
        tok = g["token"].to_numpy()
        ids = g["id"].to_numpy(dtype=np.int64)
        if ids.size and int(ids.max()) > _ID_MAX:
            raise ValueError(
                "meta_block_pairs ids must fit in 31 bits for the "
                "packed pair key; re-key to dense int64 first"
            )
        order = np.lexsort((ids, tok))
        tok = tok[order]
        ids = ids[order]
        change = np.empty(len(tok), dtype=bool)
        change[0] = True
        change[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(tok)))
        purged = 2 * sizes > purge_threshold_x2
        if purged.any():
            ps = sizes[purged].astype(np.int64)
            counters.add_many(
                {
                    "metablock_purged_blocks": int(purged.sum()),
                    "metablock_purged_pairs": int(
                        (ps * (ps - 1) // 2).sum()
                    ),
                }
            )
        keep = (sizes >= 2) & ~purged
        ai, bi = segment_pairs(starts[keep], sizes[keep], cap=None)
        if ai.size == 0:
            return _PAIR_SCHEMA.empty_table()
        # within a token block ids are sorted and distinct -> a < b
        pair = (ids[ai] << _ID_BITS) | ids[bi]
        uniq, cnt = np.unique(pair, return_counts=True)
        # mixed pair-hash bucket for the CBS combine shuffle
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


def _sizes_bucket(g: pd.DataFrame) -> pa.Table:
    """Per token-bucket: attach the GLOBAL block size to every
    (id, token) assignment (a token's rows all live in one bucket, so
    the in-bucket count IS the global size) and re-key by id bucket
    for the per-record filtering shuffle."""
    if len(g) == 0:
        return pa.table(
            {
                "id": pa.array([], type=pa.int64()),
                "token": pa.array([], type=pa.string()),
                "sz": pa.array([], type=pa.int64()),
                "id_bucket": pa.array([], type=pa.int64()),
            }
        )
    tok = g["token"].to_numpy()
    ids = g["id"].to_numpy(dtype=np.int64)
    order = np.lexsort((ids, tok))
    tok, ids = tok[order], ids[order]
    change = np.empty(len(tok), dtype=bool)
    change[0] = True
    change[1:] = tok[1:] != tok[:-1]
    seg = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    sizes = np.diff(np.append(starts, len(tok))).astype(np.int64)
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "token": pa.array(tok, type=pa.string()),
            "sz": pa.array(sizes[seg], type=pa.int64()),
            "id_bucket": pa.array(
                (ids % _NUM_BUCKETS).astype(np.int64), type=pa.int64()
            ),
        }
    )


def _filter_bucket_fn(ratio_num: int, ratio_den: int):
    """Per id-bucket BLOCK FILTERING (Papadakis et al., EDBT 2016):
    each record keeps only its ceil(ratio * nb) SMALLEST blocks
    (ties broken by token bytes) — the skew defense beyond purging:
    a mid-frequency token block shrinks to the records for which it
    is among their most selective keys. The keep rule is
    integer-exact:  rn <= ceil(num*nb/den)  <=>
    rn*den <= num*nb + den - 1  — no float boundary, so the SQL
    mirror (same integer arithmetic) cannot disagree. Dropped
    assignments are reported via the counters sidecar."""

    def fn(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "id": pa.array([], type=pa.int64()),
                "token": pa.array([], type=pa.string()),
                "bucket": pa.array([], type=pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["id", "sz", "token"], kind="mergesort"
        ).reset_index(drop=True)
        ids = g["id"].to_numpy(dtype=np.int64)
        change = np.empty(len(ids), dtype=bool)
        change[0] = True
        change[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(change)
        nb = np.diff(np.append(starts, len(ids))).astype(np.int64)
        rank = np.arange(len(ids), dtype=np.int64) - np.repeat(
            starts, nb
        )
        nb_rep = np.repeat(nb, nb)
        keep = (rank + 1) * ratio_den <= ratio_num * nb_rep + (
            ratio_den - 1
        )
        dropped = int((~keep).sum())
        if dropped:
            counters.add_many(
                {"metablock_filtered_assignments": dropped}
            )
        kept = g.loc[keep]
        tok_arr = pa.array(kept["token"], type=pa.string())
        bucket = (
            _token_h64(tok_arr).astype(np.uint64) % _NUM_BUCKETS
        ).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(
                    kept["id"].to_numpy(), type=pa.int64()
                ),
                "token": tok_arr,
                "bucket": pa.array(bucket),
            }
        )

    return fn


def meta_block_pairs(
    records: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    *,
    purge_threshold_x2: int,
    min_common: int = 3,
    block_filter: tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """-> Dataset (a, b, common_blocks), a < b: the CBS-pruned
    candidate pairs of token blocking over ``text_col`` after purging
    blocks with 2*size > ``purge_threshold_x2`` (pass 2*cap, or the
    corpus row count for a half-the-corpus cap).

    ``block_filter=(num, den)`` (opt-in) runs BLOCK FILTERING first
    (each record keeps its ceil(num/den * nb) smallest blocks,
    _filter_bucket_fn) — purging then applies to the FILTERED block
    sizes. One extra id-keyed shuffle. On zipf-vocabulary corpora
    (real text) this is the step that keeps mid-frequency token
    blocks from surviving purging with C(n,2) cost (the planted-zipf
    pytest measures a >5x comparison-count reduction at unchanged
    recall of the planted dup pairs). CAVEAT measured on this repo's
    NEAR-UNIFORM synthetic tables: when every key is equally frequent
    filtering cannot shrink the kept blocks, and it can even
    RE-ADMIT a would-be-purged block by shrinking it under the purge
    bar (the part table's 'brand' block at ratio 4/5) — filtering is
    a knob to measure per corpus, not a free win.

    ``id_col`` must be int64 ids < 2^31 (packed pair key).
    """

    def reduce_pairs(g: pd.DataFrame) -> pa.Table:
        """Vectorized CBS combine for one pair-hash bucket: sum the
        per-token-bucket partials per packed pair (one sort + one
        reduceat), prune below ``min_common``, unpack ids."""
        pairk = g["pair"].to_numpy(dtype=np.int64)
        part = g["partial"].to_numpy(dtype=np.int64)
        if pairk.size == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "common_blocks": pa.array([], type=pa.int64()),
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
        m = cnt >= min_common
        return pa.table(
            {
                "a": pa.array(uniq[m] >> _ID_BITS, type=pa.int64()),
                "b": pa.array(uniq[m] & _ID_MAX, type=pa.int64()),
                "common_blocks": pa.array(
                    cnt[m].astype(np.int64), type=pa.int64()
                ),
            }
        )

    assignments = records.map_batches(
        _tok_rows_fn(id_col, text_col), batch_format="pyarrow"
    )
    if block_filter is not None:
        num, den = block_filter
        assignments = (
            assignments.groupby("bucket")
            .map_groups(_sizes_bucket, batch_format="pandas")
            .groupby("id_bucket")
            .map_groups(
                _filter_bucket_fn(num, den), batch_format="pandas"
            )
        )
    return (
        assignments.groupby("bucket")
        .map_groups(
            _emit_bucket_fn(purge_threshold_x2),
            batch_format="pandas",
        )
        .groupby("pair_bucket")
        .map_groups(reduce_pairs, batch_format="pandas")
    )


def meta_block_topk(
    records: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    *,
    purge_threshold_x2: int,
    min_common: int = 2,
    k: int = 5,
    block_filter: tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Cardinality node pruning (CNP) over the CBS blocking graph:
    each record retains its ``k`` strongest neighbors (weight desc,
    neighbor id asc as the deterministic tie-break), and a comparison
    survives if EITHER endpoint retains it (the literature's
    redundancy-positive retention — Papadakis et al. TKDE 2014). The
    WEP weight floor (``min_common``) runs first, so CNP prunes the
    already-thinned graph.

    -> Dataset (a, b, common_blocks), a < b, the CNP-retained pairs.

    Scale shape: the top-k is node-bucketed (each node's directed
    neighbor list sorts within one bucket — one lexsort + rank per
    bucket, never a per-node loop); the either-endpoint union dedups
    on the packed pair key through a second bucketed pass. Skewed
    hubs cost O(degree log degree) in their bucket, bounded upstream
    by block purging.
    """
    pairs = meta_block_pairs(
        records,
        id_col,
        text_col,
        purge_threshold_x2=purge_threshold_x2,
        min_common=min_common,
        block_filter=block_filter,
    )

    def topk_bucket(g: pd.DataFrame) -> pa.Table:
        node = g["node"].to_numpy(dtype=np.int64)
        nbr = g["nbr"].to_numpy(dtype=np.int64)
        w = g["w"].to_numpy(dtype=np.int64)
        if node.size == 0:
            return _PAIR_SCHEMA.empty_table()
        # rank per node: weight desc, nbr asc
        order = np.lexsort((nbr, -w, node))
        node, nbr, w = node[order], nbr[order], w[order]
        change = np.empty(node.size, dtype=bool)
        change[0] = True
        change[1:] = node[1:] != node[:-1]
        seg = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        rank = np.arange(node.size) - starts[seg]
        m = rank < k
        return _retained_pairs(node[m], nbr[m], w[m])

    return (
        pairs.map_batches(_both_dirs, batch_format="pyarrow")
        .groupby("node_bucket")
        .map_groups(topk_bucket, batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(_dedup_pairs, batch_format="pandas")
    )


def _both_dirs(t: pa.Table) -> pa.Table:
    """Directed view of the CBS pair list, bucketed by node hash:
    each undirected pair becomes two (node, nbr, w) rows so a node's
    full neighbor list co-locates in one bucket."""
    a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
    b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
    w = t["common_blocks"].combine_chunks().to_numpy(
        zero_copy_only=False
    )
    node = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    ww = np.concatenate([w, w])
    with np.errstate(over="ignore"):
        nb = (
            node.astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            >> np.uint64(40)
        ) % _NUM_BUCKETS
    return pa.table(
        {
            "node": pa.array(node, type=pa.int64()),
            "nbr": pa.array(nbr, type=pa.int64()),
            "w": pa.array(ww, type=pa.int64()),
            "node_bucket": pa.array(nb.astype(np.int64)),
        }
    )


def _retained_pairs(
    node: np.ndarray, nbr: np.ndarray, w: np.ndarray
) -> pa.Table:
    """Pack a bucket's retained directed edges back to undirected
    pair keys. Either-endpoint union: the same pair may be retained
    from both sides of this bucket — combine before the dedup pass."""
    a = np.minimum(node, nbr)
    b = np.maximum(node, nbr)
    pair = (a << _ID_BITS) | b
    uniq, idx = np.unique(pair, return_index=True)
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
                w[idx], type=pa.int64()
            ),  # weight rides along (same for both directions)
            "pair_bucket": pa.array(pb.astype(np.int64)),
        }
    )


def _dedup_pairs(g: pd.DataFrame) -> pa.Table:
    """Cross-bucket either-endpoint union: one row per packed pair."""
    pairk = g["pair"].to_numpy(dtype=np.int64)
    w = g["partial"].to_numpy(dtype=np.int64)
    if pairk.size == 0:
        return pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "common_blocks": pa.array([], type=pa.int64()),
            }
        )
    uniq, idx = np.unique(pairk, return_index=True)
    return pa.table(
        {
            "a": pa.array(uniq >> _ID_BITS, type=pa.int64()),
            "b": pa.array(uniq & _ID_MAX, type=pa.int64()),
            "common_blocks": pa.array(w[idx], type=pa.int64()),
        }
    )


def meta_block_wep(
    records: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    *,
    purge_threshold_x2: int,
    block_filter: tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Weighted edge pruning (WEP) over the CBS blocking graph: one
    GLOBAL threshold — the mean edge weight of the whole graph — and
    every comparison at or above it survives (Papadakis et al. TKDE
    2014's WEP; completes the WEP/WNP/CNP pruning trio with
    ``meta_block_wnp`` / ``meta_block_topk``).

    -> Dataset (a, b, common_blocks), a < b, the WEP-retained pairs.

    Scale shape: the pair list is materialized once in the object
    store (it is consumed twice: a scalar sum/count aggregate, then
    the filter); only TWO scalars reach the driver and the compare is
    integer-exact (w * n_pairs >= sum_w), so an avg()-based SQL
    oracle cannot float-disagree.
    """
    pairs = meta_block_pairs(
        records,
        id_col,
        text_col,
        purge_threshold_x2=purge_threshold_x2,
        min_common=1,
        block_filter=block_filter,
    ).materialize()
    n_pairs = int(pairs.count())
    if not n_pairs:
        return pairs
    sum_w = int(pairs.sum("common_blocks"))

    def keep(t: pa.Table) -> pa.Table:
        w = t["common_blocks"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(w * n_pairs >= sum_w))

    return pairs.map_batches(keep, batch_format="pyarrow")


def meta_block_cep(
    records: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    *,
    purge_threshold_x2: int,
    block_filter: tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Cardinality EDGE pruning (CEP) over the CBS blocking graph:
    retain the K globally highest-weight comparisons, K = half the
    number of post-purge block assignments (Papadakis et al. TKDE
    2014's CEP — the global-budget sibling of CNP's per-node k).
    Deterministic tie-break (weight desc, a asc, b asc) so the SQL
    row_number() mirror agrees row-for-row.

    -> Dataset (a, b, common_blocks): the K retained pairs.

    Scale shape: the pair list comes from the shared bucketed CBS
    path at min_common=1; the top-K is one distributed sort + limit
    (Ray's range-partitioned sort — never a driver-side heap); K
    itself is one count aggregate over the retained assignments.
    """
    pairs = meta_block_pairs(
        records,
        id_col,
        text_col,
        purge_threshold_x2=purge_threshold_x2,
        min_common=1,
        block_filter=block_filter,
    )

    assignments = records.map_batches(
        _tok_rows_fn(id_col, text_col), batch_format="pyarrow"
    )
    if block_filter is not None:
        num, den = block_filter
        assignments = (
            assignments.groupby("bucket")
            .map_groups(_sizes_bucket, batch_format="pandas")
            .groupby("id_bucket")
            .map_groups(
                _filter_bucket_fn(num, den), batch_format="pandas"
            )
        )
    retained = (
        assignments.groupby("bucket")
        .map_groups(_sizes_bucket, batch_format="pandas")
        .map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                (
                                    2
                                    * t["sz"].to_numpy(
                                        zero_copy_only=False
                                    )
                                    <= purge_threshold_x2
                                ).sum()
                            )
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("n")
    )
    k = int(retained) // 2
    return pairs.sort(
        ["common_blocks", "a", "b"],
        descending=[True, False, False],
    ).limit(k)


def meta_block_wnp(
    records: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    *,
    purge_threshold_x2: int,
    min_common: int = 2,
    block_filter: tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Weighted node pruning (WNP) over the CBS blocking graph: each
    node's local threshold is the MEAN weight of its adjacent edges,
    and a comparison survives if its weight reaches the threshold of
    EITHER endpoint (the redundancy-positive retention — Papadakis et
    al. TKDE 2014's WNP, the weight-based sibling of CNP/
    ``meta_block_topk``). The WEP weight floor (``min_common``) runs
    first.

    -> Dataset (a, b, common_blocks), a < b, the WNP-retained pairs.

    Scale shape: identical to CNP — node-bucketed neighbor lists (one
    argsort + reduceat per bucket, never a per-node loop), then the
    bucketed pair-key union. The mean compare is INTEGER-exact
    (w * degree >= sum_w), so there is no float boundary to disagree
    with an avg()-based SQL oracle.
    """
    pairs = meta_block_pairs(
        records,
        id_col,
        text_col,
        purge_threshold_x2=purge_threshold_x2,
        min_common=min_common,
        block_filter=block_filter,
    )

    def wnp_bucket(g: pd.DataFrame) -> pa.Table:
        node = g["node"].to_numpy(dtype=np.int64)
        nbr = g["nbr"].to_numpy(dtype=np.int64)
        w = g["w"].to_numpy(dtype=np.int64)
        if node.size == 0:
            return _PAIR_SCHEMA.empty_table()
        order = np.argsort(node, kind="stable")
        node, nbr, w = node[order], nbr[order], w[order]
        change = np.empty(node.size, dtype=bool)
        change[0] = True
        change[1:] = node[1:] != node[:-1]
        seg = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(w, starts)
        deg = np.diff(np.append(starts, node.size)).astype(np.int64)
        # w >= mean  <=>  w * deg >= sum  (exact in int64: w, deg
        # both bounded by block sizes well under 2^31)
        m = w * deg[seg] >= sums[seg]
        return _retained_pairs(node[m], nbr[m], w[m])

    return (
        pairs.map_batches(_both_dirs, batch_format="pyarrow")
        .groupby("node_bucket")
        .map_groups(wnp_bucket, batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(_dedup_pairs, batch_format="pandas")
    )


def _kept_segments(g: pd.DataFrame, purge_threshold_x2: int):
    """Shared per-token-bucket segmentation: (ids sorted by token,
    per-row kept mask, kept segment count) under the standard keep
    rule — block size >= 2 and not purged (2*size <= threshold)."""
    tok = g["token"].to_numpy()
    ids = g["id"].to_numpy(dtype=np.int64)
    order = np.lexsort((ids, tok))
    tok, ids = tok[order], ids[order]
    change = np.empty(len(tok), dtype=bool)
    change[0] = True
    change[1:] = tok[1:] != tok[:-1]
    starts = np.flatnonzero(change)
    sizes = np.diff(np.append(starts, len(tok))).astype(np.int64)
    keep = (sizes >= 2) & (2 * sizes <= purge_threshold_x2)
    row_keep = np.repeat(keep, sizes)
    return ids, row_keep, int(keep.sum())


def meta_block_weights(
    records: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    *,
    purge_threshold_x2: int,
    min_common: int = 1,
    block_filter: tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Blocking-graph EDGE WEIGHTING SCHEMES beyond raw CBS
    (Papadakis et al. TKDE 2014 §4.1): for every CBS candidate pair,
    attach the per-node block cardinalities and the two normalized
    weights the pruning literature actually ranks by —

        js   = cbs / (|Bi| + |Bj| - cbs)        (Jaccard scheme)
        ecbs = cbs * log10(B/|Bi|) * log10(B/|Bj|)   (Enhanced CBS)

    where |Bi| = number of KEPT blocks containing record i and B =
    total kept blocks (kept = post-purge, size >= 2 — the blocks
    that generate at least one comparison; hapax tokens, the bulk of
    a webtext vocabulary, are excluded from every cardinality by the
    same rule on both the Ray and SQL sides). JS down-weights hub
    records that co-occur with everything; ECBS is CBS with an
    IDF-style correction. Both are pure ratios/products of exact
    integers, so round(w, 6) matches a DuckDB double oracle.

    -> Dataset (a, b, cbs, bi, bj, js, ecbs), a < b.

    Scale shape: the pair list is the shared bucketed CBS path; node
    cardinalities are one extra token-bucket pass with per-bucket
    np.unique partials summed by an id-keyed bucket shuffle (never a
    per-node loop, nothing driver-sized); B is a scalar sum; the
    attach is two distributed bucketed hash joins (pr_curve's shape)
    with the tiny B broadcast in the finisher closure.
    """
    from ..stages.join import bucket_join

    pairs = meta_block_pairs(
        records,
        id_col,
        text_col,
        purge_threshold_x2=purge_threshold_x2,
        min_common=min_common,
        block_filter=block_filter,
    )

    assignments = records.map_batches(
        _tok_rows_fn(id_col, text_col), batch_format="pyarrow"
    )
    if block_filter is not None:
        num, den = block_filter
        assignments = (
            assignments.groupby("bucket")
            .map_groups(_sizes_bucket, batch_format="pandas")
            .groupby("id_bucket")
            .map_groups(
                _filter_bucket_fn(num, den), batch_format="pandas"
            )
        )
        assignments = assignments.materialize()

    def block_count_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"nb": pa.array([0], type=pa.int64())})
        _, _, n_kept = _kept_segments(g, purge_threshold_x2)
        return pa.table({"nb": pa.array([n_kept], type=pa.int64())})

    total_blocks = int(
        assignments.groupby("bucket")
        .map_groups(block_count_bucket, batch_format="pandas")
        .sum("nb")
        or 0
    )

    def node_partials(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "id": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
                "id_bucket": pa.array([], type=pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        ids, row_keep, _ = _kept_segments(g, purge_threshold_x2)
        kept_ids = ids[row_keep]
        if kept_ids.size == 0:
            return empty
        uid, cnt = np.unique(kept_ids, return_counts=True)
        return pa.table(
            {
                "id": pa.array(uid, type=pa.int64()),
                "part": pa.array(
                    cnt.astype(np.int64), type=pa.int64()
                ),
                "id_bucket": pa.array(
                    (uid % _NUM_BUCKETS).astype(np.int64)
                ),
            }
        )

    def sum_node(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "nb": pa.array([], type=pa.int64()),
                }
            )
        s = g.groupby("id", sort=False)["part"].sum()
        return pa.table(
            {
                "id": pa.array(
                    s.index.to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "nb": pa.array(
                    s.to_numpy(dtype=np.int64), type=pa.int64()
                ),
            }
        )

    nodes = (
        assignments.groupby("bucket")
        .map_groups(node_partials, batch_format="pandas")
        .groupby("id_bucket")
        .map_groups(sum_node, batch_format="pandas")
    )

    def side(n: str):
        return nodes.map_batches(
            lambda t, c=n: pa.table({"id": t["id"], c: t["nb"]}),
            batch_format="pyarrow",
        )

    pair_schema = {
        "a": pa.int64(),
        "b": pa.int64(),
        "common_blocks": pa.int64(),
    }
    j1 = bucket_join(
        pairs,
        side("bi"),
        left_on="a",
        right_on="id",
        left_schema=pair_schema,
        right_schema={"id": pa.int64(), "bi": pa.int64()},
    )
    j2 = bucket_join(
        j1,
        side("bj"),
        left_on="b",
        right_on="id",
        left_schema={**pair_schema, "bi": pa.int64()},
        right_schema={"id": pa.int64(), "bj": pa.int64()},
    )

    def weigh(t: pa.Table) -> pa.Table:
        cbs = t["common_blocks"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        bi = t["bi"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        bj = t["bj"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        js = cbs / (bi + bj - cbs)
        ecbs = (
            cbs
            * np.log10(total_blocks / bi)
            * np.log10(total_blocks / bj)
        )
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "cbs": t["common_blocks"],
                "bi": t["bi"],
                "bj": t["bj"],
                "js": pa.array(np.round(js, 6), type=pa.float64()),
                "ecbs": pa.array(
                    np.round(ecbs, 6), type=pa.float64()
                ),
            }
        )

    return j2.map_batches(weigh, batch_format="pyarrow")


def tfidf_cosine_pairs(
    records: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    *,
    n_records: int,
    threshold: float,
) -> "ray.data.Dataset":
    """TF-IDF COSINE similarity self-join (WHIRL, Cohen SIGMOD
    1998): every record is an idf-weighted set vector over its
    distinct tokens and pairs with cosine >= ``threshold`` are
    emitted — the soft-matching comparison measure classic ER stacks
    rank string pairs by, complementing the char-level kernels
    (Jaro-Winkler / Levenshtein) and the unweighted set measures
    (jaccard/cosine/dice in setsim_neardup) already in-repo.

        idf_t     = ln(N / df_t)           (set semantics, tf = 1)
        cos(i,j)  = sum_{t in Ti∩Tj} idf_t^2 / (||vi|| * ||vj||)

    Near-stopword tokens with 2*df > N (more than half the corpus)
    are dropped from every vector on BOTH the Ray and SQL sides —
    their idf is < ln 2 and they are exactly the blocks that would
    cost C(n,2) pair emission (the same purge rule meta-blocking
    uses, here doubling as the skew defense).

    -> Dataset (a, b, cosine), a < b, cosine rounded to 6.

    Scale shape: one token-bucket shuffle computes df/idf in-bucket
    (a token's rows co-locate) and emits BOTH per-record norm
    partials and per-pair dot partials (idf^2 summed per packed pair
    within the bucket — np.add.reduceat, no Python loop); an
    id-keyed bucket shuffle sums the norms; a pair-keyed bucket
    shuffle sums the dots; two distributed bucketed hash joins attach
    the endpoint norms; the finisher divides and filters. Nothing is
    driver-sized and no all-pairs step exists outside a token block
    bounded by the purge rule.
    """
    from ..stages.join import bucket_join

    log_n = float(np.log(float(n_records)))

    assignments = records.map_batches(
        _tok_rows_fn(id_col, text_col), batch_format="pyarrow"
    )

    def norm_partials(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "id": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.float64()),
                "id_bucket": pa.array([], type=pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        tok = g["token"].to_numpy()
        ids = g["id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, tok))
        tok, ids = tok[order], ids[order]
        change = np.empty(len(tok), dtype=bool)
        change[0] = True
        change[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(tok))).astype(np.int64)
        kept = 2 * sizes <= n_records
        row_keep = np.repeat(kept, sizes)
        if not row_keep.any():
            return empty
        idf = log_n - np.log(sizes.astype(np.float64))
        idf2_row = np.repeat(idf * idf, sizes)[row_keep]
        ids_k = ids[row_keep]
        # per-id partial sums within this bucket (ids not contiguous
        # after the token sort -> one more argsort + reduceat)
        o2 = np.argsort(ids_k, kind="stable")
        ids_k, idf2_row = ids_k[o2], idf2_row[o2]
        ch = np.empty(ids_k.size, dtype=bool)
        ch[0] = True
        ch[1:] = ids_k[1:] != ids_k[:-1]
        st = np.flatnonzero(ch)
        return pa.table(
            {
                "id": pa.array(ids_k[st], type=pa.int64()),
                "part": pa.array(
                    np.add.reduceat(idf2_row, st), type=pa.float64()
                ),
                "id_bucket": pa.array(
                    (ids_k[st] % _NUM_BUCKETS).astype(np.int64)
                ),
            }
        )

    def sum_norm(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "n2": pa.array([], type=pa.float64()),
                }
            )
        s = g.groupby("id", sort=False)["part"].sum()
        return pa.table(
            {
                "id": pa.array(
                    s.index.to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "n2": pa.array(
                    s.to_numpy(dtype=np.float64), type=pa.float64()
                ),
            }
        )

    norms = (
        assignments.groupby("bucket")
        .map_groups(norm_partials, batch_format="pandas")
        .groupby("id_bucket")
        .map_groups(sum_norm, batch_format="pandas")
    )

    _DOT_SCHEMA = pa.schema(
        [
            ("pair", pa.int64()),
            ("partial", pa.float64()),
            ("pair_bucket", pa.int64()),
        ]
    )

    def dot_partials(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _DOT_SCHEMA.empty_table()
        tok = g["token"].to_numpy()
        ids = g["id"].to_numpy(dtype=np.int64)
        if ids.size and int(ids.max()) > _ID_MAX:
            raise ValueError(
                "tfidf_cosine_pairs ids must fit in 31 bits for the "
                "packed pair key; re-key to dense int64 first"
            )
        order = np.lexsort((ids, tok))
        tok, ids = tok[order], ids[order]
        change = np.empty(len(tok), dtype=bool)
        change[0] = True
        change[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(tok))).astype(np.int64)
        purged = 2 * sizes > n_records
        if purged.any():
            ps = sizes[purged].astype(np.int64)
            counters.add_many(
                {
                    "tfidf_cos_purged_tokens": int(purged.sum()),
                    "tfidf_cos_purged_pairs": int(
                        (ps * (ps - 1) // 2).sum()
                    ),
                }
            )
        keep = (sizes >= 2) & ~purged
        ai, bi = segment_pairs(starts[keep], sizes[keep], cap=None)
        if ai.size == 0:
            return _DOT_SCHEMA.empty_table()
        idf = log_n - np.log(sizes.astype(np.float64))
        seg = np.cumsum(change) - 1
        w_pair = (idf * idf)[seg[ai]]
        pair = (ids[ai] << _ID_BITS) | ids[bi]
        o2 = np.argsort(pair, kind="stable")
        pair, w_pair = pair[o2], w_pair[o2]
        ch = np.empty(pair.size, dtype=bool)
        ch[0] = True
        ch[1:] = pair[1:] != pair[:-1]
        st = np.flatnonzero(ch)
        uniq = pair[st]
        dots = np.add.reduceat(w_pair, st)
        with np.errstate(over="ignore"):
            pb = (
                uniq.astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(40)
            ) % _NUM_BUCKETS
        return pa.table(
            {
                "pair": pa.array(uniq, type=pa.int64()),
                "partial": pa.array(dots, type=pa.float64()),
                "pair_bucket": pa.array(pb.astype(np.int64)),
            }
        )

    def sum_dots(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "dot": pa.array([], type=pa.float64()),
                }
            )
        pairk = g["pair"].to_numpy(dtype=np.int64)
        part = g["partial"].to_numpy(dtype=np.float64)
        order = np.argsort(pairk, kind="stable")
        pairk, part = pairk[order], part[order]
        ch = np.empty(pairk.size, dtype=bool)
        ch[0] = True
        ch[1:] = pairk[1:] != pairk[:-1]
        st = np.flatnonzero(ch)
        uniq = pairk[st]
        return pa.table(
            {
                "a": pa.array(uniq >> _ID_BITS, type=pa.int64()),
                "b": pa.array(uniq & _ID_MAX, type=pa.int64()),
                "dot": pa.array(
                    np.add.reduceat(part, st), type=pa.float64()
                ),
            }
        )

    dots = (
        assignments.groupby("bucket")
        .map_groups(dot_partials, batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(sum_dots, batch_format="pandas")
    )

    def side(n: str):
        return norms.map_batches(
            lambda t, c=n: pa.table({"id": t["id"], c: t["n2"]}),
            batch_format="pyarrow",
        )

    j1 = bucket_join(
        dots,
        side("n2a"),
        left_on="a",
        right_on="id",
        left_schema={
            "a": pa.int64(),
            "b": pa.int64(),
            "dot": pa.float64(),
        },
        right_schema={"id": pa.int64(), "n2a": pa.float64()},
    )
    j2 = bucket_join(
        j1,
        side("n2b"),
        left_on="b",
        right_on="id",
        left_schema={
            "a": pa.int64(),
            "b": pa.int64(),
            "dot": pa.float64(),
            "n2a": pa.float64(),
        },
        right_schema={"id": pa.int64(), "n2b": pa.float64()},
    )

    def finish(t: pa.Table) -> pa.Table:
        dot = t["dot"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n2a = t["n2a"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n2b = t["n2b"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cos = dot / np.sqrt(n2a * n2b)
        m = cos >= threshold
        return pa.table(
            {
                "a": t["a"].combine_chunks().filter(pa.array(m)),
                "b": t["b"].combine_chunks().filter(pa.array(m)),
                "cosine": pa.array(
                    np.round(cos[m], 6), type=pa.float64()
                ),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")
