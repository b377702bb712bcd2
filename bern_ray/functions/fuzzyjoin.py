"""Fuzzy A×B join: blocked cross-table record linkage.

The dedup family (functions/dedup.py) links records WITHIN one table;
this is the other half of entity resolution — joining a dirty table
against a reference table on string similarity. Reference analog: the
normalizers' exact/fallback dictionary lookups (normalize.py:584-589)
are the degenerate similarity-1.0 case of this operator; the brief's
north star ("batched Jaro-Winkler ... ensemble") is its general form.

Execution shape (the canonical blocked similarity join):
  1. both sides map to (block_key int64, id, name) — stateless,
     shuffle-free; the block function must be cheap and SQL-mirrorable
     for the oracle;
  2. one distributed bucket_join on the block key co-locates candidate
     pairs (many-to-many merge inside a bucket);
  3. a shuffle-free map_batches computes batched Jaro-Winkler over the
     candidate pairs and filters by threshold.

Blocking is a RECALL TRADE documented at the call site: pairs whose
block keys differ are never compared (exactly like dedup blocking);
the DuckDB oracle applies the identical block predicate, so the gate
verifies the blocked semantics, not an unblocked ideal.

Our Jaro-Winkler matches DuckDB's `jaro_winkler_similarity` bit-for-
bit on non-empty strings (prefix scale 0.1, 4-char cap — verified
over the fixture corpus); empty-vs-empty diverges (we say 1.0, DuckDB
0.0), so callers must not feed empty names to an oracle-gated join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..core.similarity import jaro_winkler
from ..stages.join import bucket_join


def fuzzy_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    block_fn,
    threshold: float = 0.9,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """left (l_id, l_name) ⋈~ right (r_id, r_name) by Jaro-Winkler.

    ``block_fn(names: list[str]) -> np.ndarray[int64]`` assigns each
    name a block key; only same-block pairs are scored. Returns
    (l_id, r_id, jw float64 rounded to 6dp) for pairs with
    jw >= threshold.
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
        },
        right_schema={
            "bk": pa.int64(),
            "r_id": pa.int64(),
            "r_name": pa.string(),
        },
        num_buckets=num_buckets,
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_id": pa.array([], type=pa.int64()),
                    "r_id": pa.array([], type=pa.int64()),
                    "jw": pa.array([], type=pa.float64()),
                }
            )
        jw = jaro_winkler(
            t["l_name"].to_pylist(), t["r_name"].to_pylist()
        )
        keep = jw >= threshold
        return pa.table(
            {
                "l_id": pa.array(
                    t["l_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "r_id": pa.array(
                    t["r_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "jw": pa.array(np.round(jw[keep], 6), type=pa.float64()),
            }
        )

    return cand.map_batches(score, batch_format="pyarrow")


def suffix_digits_block(names: list[str], k: int = 3) -> np.ndarray:
    """Block key = the name's last-k characters encoded as an int64.

    Equality of the key tracks string equality of the raw k-char tail
    (the SQL oracle's ``substr(name, -k)`` block predicate): a tail of
    <= 7 UTF-8 bytes is embedded INJECTIVELY via a length prefix +
    ``int.from_bytes`` (the prefix keeps ``'\\x00ab'`` and ``'ab'``
    distinct; max value 7*2^56 + 2^56 < 2^63, so the int64 never
    overflows); longer tails fall back to a 63-bit blake2b digest.
    The digest path is one-sided only in the DROP direction: a
    collision never drops an oracle pair, but it can merge two oracle
    blocks, and a cross-block candidate that then passes the jw
    threshold is an EXTRA emitted row the substr-equality oracle
    excludes — probability ~n^2/2^63 per key population, negligible at
    oracle scale but not zero."""
    import hashlib

    out = np.empty(len(names), dtype=np.int64)
    for i, s in enumerate(names):
        raw = (s or "")[-k:].encode("utf-8")
        if len(raw) <= 7:
            out[i] = int.from_bytes(bytes([len(raw)]) + raw, "big")
        else:
            out[i] = (
                int.from_bytes(
                    hashlib.blake2b(raw, digest_size=8).digest(), "big"
                )
                >> 1
            )
    return out


def _split_tokens(names) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """-> (parent_idx, pos 1-based, tokens): explode each name on
    single spaces, exactly mirroring SQL ``string_split(nm, ' ')``
    (consecutive spaces yield empty tokens there too)."""
    import pyarrow.compute as pc

    col = names
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    lists = pc.split_pattern(pc.fill_null(col, ""), " ")
    toks = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    # 1-based position within each name (mirrors the SQL ordinality)
    if len(parent):
        starts = np.flatnonzero(
            np.diff(np.concatenate(([-1], parent))) != 0
        )
        run_start = np.zeros(len(parent), dtype=np.int64)
        run_start[starts] = starts
        np.maximum.accumulate(run_start, out=run_start)
        pos = np.arange(len(parent), dtype=np.int64) - run_start + 1
    else:
        pos = np.empty(0, dtype=np.int64)
    return parent, pos, toks


def monge_elkan_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    threshold: float = 0.88,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """left (l_id, l_name) ⋈~ right (r_id, r_name) by the MONGE-ELKAN
    hybrid similarity (Monge & Elkan 1996; the standard multi-token
    string measure of Christen's ER survey §5.3): with left tokens
    a_1..a_m and right tokens b_1..b_n,

        ME(A, B) = (1/m) * sum_i max_j JW(a_i, b_j)

    — token-REORDER-robust where whole-string Jaro-Winkler is not
    ("cold widget" vs "widget c0ld" scores ~0.92 here, ~0.55 as whole
    strings). Asymmetric by definition: the mean runs over LEFT token
    occurrences (duplicate right tokens only feed the max).

    Candidates are token-blocked: only pairs sharing at least one
    EXACT token are scored (the blocking recall trade, mirrored by
    the SQL oracle's token equi-join). The shared-token join runs on
    a 63-bit token hash with in-bucket exact-token verification, so
    hash collisions never add or drop a pair. Skew caveat: a token
    shared by f_l left and f_r right rows emits f_l*f_r candidates —
    on hot-token corpora compose with block purging
    (functions/metablocking.py) before this join.

    Returns (l_id, r_id, me float64 rounded 6dp) where me >= threshold.
    Ids must be int64 < 2^31 (packed pair dedup key).
    """
    pairs = _blocked_name_pairs(left, right, num_buckets)
    return pairs.map_batches(
        _me_score_fn(threshold), batch_format="pyarrow"
    )


def _blocked_name_pairs(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    num_buckets: int,
) -> "ray.data.Dataset":
    """Shared candidate machinery of the hybrid-measure joins
    (Monge-Elkan, soft TF-IDF): token-blocked DISTINCT (l_id, r_id)
    pairs — token-hash bucket join with in-bucket exact-token
    verification, packed-pair global dedup — with both full name
    strings attached via two bucketed id joins."""
    import pandas as pd
    import pyarrow.compute as pc

    from .textstats import _token_h64

    def tok_rows(id_col, name_col, id_out, tok_out, with_pos):
        def fn(t: pa.Table) -> pa.Table:
            parent, pos, toks = _split_tokens(t[name_col])
            ids = t[id_col].combine_chunks().to_numpy(
                zero_copy_only=False
            )[parent]
            cols = {
                id_out: pa.array(
                    ids.astype(np.int64), type=pa.int64()
                ),
                tok_out: toks,
                "th": pa.array(
                    _token_h64(toks).astype(np.int64)
                    if len(toks)
                    else np.empty(0, dtype=np.int64),
                    type=pa.int64(),
                ),
            }
            if with_pos:
                cols["pos"] = pa.array(pos, type=pa.int64())
            return pa.table(cols)

        return fn

    lt = left.map_batches(
        tok_rows("l_id", "l_name", "l_id", "l_tok", False),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        tok_rows("r_id", "r_name", "r_id", "r_tok", False),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        lt,
        rt,
        left_on="th",
        right_on="th",
        left_schema={
            "th": pa.int64(),
            "l_id": pa.int64(),
            "l_tok": pa.string(),
        },
        right_schema={
            "th": pa.int64(),
            "r_id": pa.int64(),
            "r_tok": pa.string(),
        },
        num_buckets=num_buckets,
    )

    _ID_BITS, _NB = 31, 256
    _ID_MAX = (1 << _ID_BITS) - 1

    def pack_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "pair": pa.array([], type=pa.int64()),
                    "pb": pa.array([], type=pa.int64()),
                }
            )
        same = pc.equal(t["l_tok"], t["r_tok"])
        t = t.filter(same)
        li = t["l_id"].to_numpy(zero_copy_only=False)
        ri = t["r_id"].to_numpy(zero_copy_only=False)
        if li.size and max(int(li.max()), int(ri.max())) > _ID_MAX:
            raise ValueError(
                "monge_elkan_join ids must fit in 31 bits"
            )
        pair = np.unique((li << np.int64(_ID_BITS)) | ri)
        with np.errstate(over="ignore"):
            pb = (
                pair.astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(40)
            ) % _NB
        return pa.table(
            {
                "pair": pa.array(pair, type=pa.int64()),
                "pb": pa.array(pb.astype(np.int64)),
            }
        )

    def distinct_pairs(g: pd.DataFrame) -> pa.Table:
        u = np.unique(g["pair"].to_numpy(dtype=np.int64))
        return pa.table(
            {
                "l_id": pa.array(u >> _ID_BITS, type=pa.int64()),
                "r_id": pa.array(u & _ID_MAX, type=pa.int64()),
            }
        )

    cand = (
        joined.map_batches(pack_pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(distinct_pairs, batch_format="pandas")
    )

    with_l = bucket_join(
        cand,
        left,
        left_on="l_id",
        right_on="l_id",
        left_schema={"l_id": pa.int64(), "r_id": pa.int64()},
        right_schema={"l_id": pa.int64(), "l_name": pa.string()},
        num_buckets=num_buckets,
    )
    with_both = bucket_join(
        with_l,
        right,
        left_on="r_id",
        right_on="r_id",
        left_schema={
            "l_id": pa.int64(),
            "r_id": pa.int64(),
            "l_name": pa.string(),
        },
        right_schema={"r_id": pa.int64(), "r_name": pa.string()},
        num_buckets=num_buckets,
    )

    return with_both


def _token_cross(t: pa.Table):
    """Flattened per-pair token cross product of a candidate batch:
    -> (n, lp, ltoks, rtoks, a_idx, b_idx, grp_starts, l_rep, jw)
    where jw[g] runs over each (pair, left-token) group's right
    tokens (group g starts at grp_starts[g]); returns None when the
    batch yields no comparisons."""
    lp, _, ltoks = _split_tokens(t["l_name"])
    rp, _, rtoks = _split_tokens(t["r_name"])
    n = t.num_rows
    lm = np.bincount(lp, minlength=n)
    rm = np.bincount(rp, minlength=n)
    total = int((lm * rm).sum())
    if total == 0:
        return None
    # each left-token occurrence of pair i repeats rm[i] times
    l_rep = np.repeat(rm, lm)
    a_idx = np.repeat(np.arange(len(ltoks), dtype=np.int64), l_rep)
    r_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(rm, out=r_starts[1:])
    grp_starts = np.zeros(len(a_idx) + 1, dtype=np.int64)
    np.cumsum(l_rep, out=grp_starts[1 : len(l_rep) + 1])
    within = np.arange(total, dtype=np.int64) - np.repeat(
        grp_starts[: len(l_rep)], l_rep
    )
    b_idx = r_starts[lp[a_idx]] + within
    jw = jaro_winkler(
        ltoks.take(pa.array(a_idx)).to_pylist(),
        rtoks.take(pa.array(b_idx)).to_pylist(),
    )
    return n, lp, ltoks, rtoks, a_idx, b_idx, grp_starts, l_rep, jw


def _me_score_fn(threshold: float):
    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_id": pa.array([], type=pa.int64()),
                "r_id": pa.array([], type=pa.int64()),
                "me": pa.array([], type=pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        cross = _token_cross(t)
        if cross is None:
            return empty
        n, lp, _, _, _, _, grp_starts, l_rep, jw = cross
        # max over right tokens per left-token occurrence
        keep_groups = np.flatnonzero(l_rep > 0)
        mx = np.maximum.reduceat(jw, grp_starts[keep_groups])
        # mean over left-token occurrences per pair
        per_tok_pair = lp[keep_groups]
        sums = np.bincount(per_tok_pair, weights=mx, minlength=n)
        cnts = np.bincount(per_tok_pair, minlength=n)
        valid = cnts > 0
        me = np.zeros(n, dtype=np.float64)
        me[valid] = sums[valid] / cnts[valid]
        keep = valid & (me >= threshold)
        return pa.table(
            {
                "l_id": pa.array(
                    t["l_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "r_id": pa.array(
                    t["r_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "me": pa.array(
                    np.round(me[keep], 6), type=pa.float64()
                ),
            }
        )

    return score


def one_to_one_match(
    pairs: "ray.data.Dataset",
    *,
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "me",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """MUTUAL-BEST-MATCH 1:1 assignment over scored candidate pairs —
    the greedy-free symmetric reduction every record-linkage deploy
    runs after scoring (Fellegi-Sunter's one-to-one restriction;
    "best-buddy" matching): keep (l, r) iff r is l's best-scoring
    candidate AND l is r's, ties broken by ascending partner id.
    Unlike sequential greedy assignment this is order-free, so it
    distributes as two per-side argmax shuffles + one pair-key join
    and is exactly mirrored by a SQL double row_number() oracle.

    Output (l_col, r_col, score_col) — a subset of the input pairs in
    which every l and every r appears at most once (1:1 by
    construction: each side's winner is unique per key).

    Ids must be int64 < 2^31 (packed pair join key)."""
    import pandas as pd
    import pyarrow.compute as pc

    _ID_BITS, _NB = 31, 256
    _ID_MAX = (1 << _ID_BITS) - 1

    def tag(group_col):
        def fn(t: pa.Table) -> pa.Table:
            g = t[group_col].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                b = (
                    g.astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    >> np.uint64(40)
                ) % _NB
            return pa.table(
                {
                    "g": pa.array(g, type=pa.int64()),
                    "o": pc.cast(
                        t[r_col if group_col == l_col else l_col],
                        pa.int64(),
                    ),
                    "s": pc.cast(t[score_col], pa.float64()),
                    "gb": pa.array(b.astype(np.int64)),
                }
            )

        return fn

    def best_bucket(swap: bool):
        def fn(g: pd.DataFrame) -> pa.Table:
            if len(g) == 0:
                return pa.table(
                    {
                        "pair": pa.array([], type=pa.int64()),
                        "s": pa.array([], type=pa.float64()),
                        "pb": pa.array([], type=pa.int64()),
                    }
                )
            # argmax per group: score desc, partner id asc
            d = g.sort_values(
                ["g", "s", "o"], ascending=[True, False, True]
            ).drop_duplicates("g")
            gi = d["g"].to_numpy(dtype=np.int64)
            oi = d["o"].to_numpy(dtype=np.int64)
            if gi.size and max(int(gi.max()), int(oi.max())) > _ID_MAX:
                raise ValueError(
                    "one_to_one_match ids must fit in 31 bits"
                )
            li, ri = (oi, gi) if swap else (gi, oi)
            pair = (li << np.int64(_ID_BITS)) | ri
            with np.errstate(over="ignore"):
                pb = (
                    pair.astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    >> np.uint64(40)
                ) % _NB
            return pa.table(
                {
                    "pair": pa.array(pair, type=pa.int64()),
                    "s": pa.array(
                        d["s"].to_numpy(dtype=np.float64)
                    ),
                    "pb": pa.array(pb.astype(np.int64)),
                }
            )

        return fn

    pairs = pairs.materialize()
    left_best = (
        pairs.map_batches(tag(l_col), batch_format="pyarrow")
        .groupby("gb")
        .map_groups(best_bucket(swap=False), batch_format="pandas")
        .map_batches(
            lambda t: t.select(["pair", "s"]),
            batch_format="pyarrow",
        )
    )
    right_best = (
        pairs.map_batches(tag(r_col), batch_format="pyarrow")
        .groupby("gb")
        .map_groups(best_bucket(swap=True), batch_format="pandas")
        .map_batches(
            lambda t: t.select(["pair"]), batch_format="pyarrow"
        )
    )
    mutual = bucket_join(
        left_best,
        right_best,
        left_on="pair",
        right_on="pair",
        left_schema={"pair": pa.int64(), "s": pa.float64()},
        right_schema={"pair": pa.int64()},
        num_buckets=num_buckets,
    )

    def unpack(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                l_col: pa.array(p >> _ID_BITS, type=pa.int64()),
                r_col: pa.array(p & _ID_MAX, type=pa.int64()),
                score_col: pa.array(
                    t["s"].to_numpy(zero_copy_only=False),
                    type=pa.float64(),
                ),
            }
        )

    return mutual.map_batches(unpack, batch_format="pyarrow")


def clean_token_df(
    left: "ray.data.Dataset",
    *,
    name_col: str = "l_name",
    id_col: str = "l_id",
    vocab_limit: int = 1_000_000,
) -> tuple[np.ndarray, np.ndarray, int]:
    """(sorted token-hash array, df array, N): document frequency of
    every distinct token of the reference corpus, keyed by the 63-bit
    token hash for vectorized searchsorted lookup inside score
    kernels, plus the corpus row count N. The vocabulary is
    broadcast-sized by assumption (name fields, not documents) —
    ``vocab_limit`` guards it: beyond the limit the caller must shard
    the idf table instead of broadcasting (raise, never truncate
    silently). Hash collisions merge two tokens' df (p ~ V^2/2^63)."""
    import pandas as pd

    from .textstats import _token_h64

    def tok_partial(t: pa.Table) -> pa.Table:
        parent, _, toks = _split_tokens(t[name_col])
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False
        )[parent]
        df = pd.DataFrame(
            {
                "th": _token_h64(toks).astype(np.int64)
                if len(toks)
                else np.empty(0, dtype=np.int64),
                "id": ids.astype(np.int64),
            }
        ).drop_duplicates()
        # a record lives in one batch: per-batch (token, id) dedup is
        # global, so counts are summable partials of the true df
        vc = df.groupby("th", sort=False).size()
        return pa.table(
            {
                "th": pa.array(
                    vc.index.to_numpy(), type=pa.int64()
                ),
                "partial": pa.array(
                    vc.to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    agg = (
        left.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("th")
        .sum("partial")
    )
    rows = agg.take_all()
    if len(rows) > vocab_limit:
        raise ValueError(
            f"token vocabulary {len(rows)} exceeds vocab_limit="
            f"{vocab_limit}; shard the idf table instead of "
            "broadcasting"
        )
    th = np.array([r["th"] for r in rows], dtype=np.int64)
    df = np.array(
        [r["sum(partial)"] for r in rows], dtype=np.float64
    )
    order = np.argsort(th)
    n = int(left.count())
    return th[order], df[order], n


def soft_tfidf_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    theta: float = 0.8,
    threshold: float = 0.8,
    num_buckets: int = 64,
    vocab_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """left (l_id, l_name) ⋈~ right (r_id, r_name) by SOFT TF-IDF
    (Cohen, Ravikumar & Fienberg, IIWeb 2003 — their best-performing
    name-matching measure): WHIRL's tf-idf cosine relaxed so tokens
    need only be CLOSE (Jaro-Winkler >= ``theta``), not equal:

        S(A, B) = sum over a in A with jmax(a) >= theta of
                  V(a, A) * V(b*(a), B) * jmax(a)

    where jmax(a) = max_b JW(a, b), b*(a) the argmax (ties: the
    highest-weight tied token), and V(t, X) = idf(t)/||X|| the
    L2-normalized idf weight (tf = occurrence count is 1 per token
    occurrence here; idf = ln((1+N)/(1+df)) from the LEFT corpus,
    unseen tokens df = 0).

    Candidates are token-blocked exactly like monge_elkan_join
    (shared >= 1 exact token; the recall trade the SQL oracle
    mirrors). The idf table is a broadcast sorted-hash array
    (clean_token_df) — name-field vocabularies are broadcast-sized;
    the guard raises beyond ``vocab_limit``.

    Returns (l_id, r_id, soft_tfidf float64 rounded 6dp) where
    score >= threshold."""
    import ray

    th_arr, df_arr, n_docs = clean_token_df(
        left, vocab_limit=vocab_limit
    )
    idf_ref = ray.put(
        (th_arr, np.log((1.0 + n_docs) / (1.0 + df_arr)))
    )
    idf_unseen = float(np.log(1.0 + n_docs))

    from .textstats import _token_h64

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_id": pa.array([], type=pa.int64()),
                "r_id": pa.array([], type=pa.int64()),
                "soft_tfidf": pa.array([], type=pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        cross = _token_cross(t)
        if cross is None:
            return empty
        n, lp, ltoks, rtoks, a_idx, b_idx, grp_starts, l_rep, jw = (
            cross
        )
        th_keys, idf_vals = ray.get(idf_ref)

        def idf_of(toks) -> np.ndarray:
            h = _token_h64(toks).astype(np.int64)
            pos = np.searchsorted(th_keys, h)
            pos_c = np.clip(pos, 0, len(th_keys) - 1)
            hit = (len(th_keys) > 0) & (th_keys[pos_c] == h)
            out = np.full(len(h), idf_unseen, dtype=np.float64)
            if len(th_keys):
                out[hit] = idf_vals[pos_c[hit]]
            return out

        rp, _, _ = _split_tokens(t["r_name"])
        lw = idf_of(ltoks)
        rw = idf_of(rtoks)
        lnorm = np.sqrt(np.bincount(lp, weights=lw * lw, minlength=n))
        rnorm = np.sqrt(np.bincount(rp, weights=rw * rw, minlength=n))
        # per (pair, left-token) group: jmax and the max weight among
        # jw-tied argmax right tokens
        keep_groups = np.flatnonzero(l_rep > 0)
        jmax = np.maximum.reduceat(jw, grp_starts[keep_groups])
        is_max = jw == np.repeat(jmax, l_rep[keep_groups])
        bw_masked = np.where(is_max, rw[b_idx], -np.inf)
        wb = np.maximum.reduceat(bw_masked, grp_starts[keep_groups])
        a_occ = a_idx[grp_starts[keep_groups]]
        pair_of_group = lp[a_occ]
        close = jmax >= theta
        # contribution, mirroring the SQL's left-to-right fp order:
        # ((aw / lnorm) * wb) / rnorm * jmax
        contrib = (
            (lw[a_occ] / lnorm[pair_of_group])
            * wb
            / rnorm[pair_of_group]
            * jmax
        )
        sums = np.bincount(
            pair_of_group[close],
            weights=contrib[close],
            minlength=n,
        )
        keep = sums >= threshold
        return pa.table(
            {
                "l_id": pa.array(
                    t["l_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "r_id": pa.array(
                    t["r_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "soft_tfidf": pa.array(
                    np.round(sums[keep], 6), type=pa.float64()
                ),
            }
        )

    pairs = _blocked_name_pairs(left, right, num_buckets)
    return pairs.map_batches(score, batch_format="pyarrow")


def topk_matches(
    pairs: "ray.data.Dataset",
    k: int,
    *,
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "me",
) -> "ray.data.Dataset":
    """TOP-K similarity matches per left record: each l keeps its k
    best-scoring candidates (score desc, ties by ascending r id),
    with the 1-based rank attached — the candidate shortlist a human
    review queue or a downstream classifier consumes (the k=1 case is
    one side of one_to_one_match). One bucketed shuffle on l's hash;
    nothing driver-sized. Output (l_col, r_col, score_col, rk)."""
    import pandas as pd
    import pyarrow.compute as pc

    _NB = 256

    def tag(t: pa.Table) -> pa.Table:
        g = t[l_col].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            b = (
                g.astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                >> np.uint64(40)
            ) % _NB
        return pa.table(
            {
                "g": pa.array(g, type=pa.int64()),
                "o": pc.cast(t[r_col], pa.int64()),
                "s": pc.cast(t[score_col], pa.float64()),
                "gb": pa.array(b.astype(np.int64)),
            }
        )

    def topk_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    l_col: pa.array([], type=pa.int64()),
                    r_col: pa.array([], type=pa.int64()),
                    score_col: pa.array([], type=pa.float64()),
                    "rk": pa.array([], type=pa.int64()),
                }
            )
        d = g.sort_values(
            ["g", "s", "o"], ascending=[True, False, True]
        )
        rk = d.groupby("g", sort=False).cumcount() + 1
        d = d[rk <= k]
        rk = rk[rk <= k]
        return pa.table(
            {
                l_col: pa.array(
                    d["g"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                r_col: pa.array(
                    d["o"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                score_col: pa.array(
                    d["s"].to_numpy(dtype=np.float64),
                    type=pa.float64(),
                ),
                "rk": pa.array(
                    rk.to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    return (
        pairs.map_batches(tag, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(topk_bucket, batch_format="pandas")
    )


# ------------------------------------------- optimal 1:1 assignment

OPTIMAL_MATCH_MAX_SIDE = 2000  # dense-matrix guard per component


def optimal_matching(
    pairs: "ray.data.Dataset",
    *,
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "me",
) -> "ray.data.Dataset":
    """EXACT maximum-total-weight bipartite 1:1 assignment over
    scored candidate pairs — the globally optimal counterpart of
    one_to_one_match's mutual-best greedy (which can forfeit weight:
    scores {(a,x)=2.0, (a,y)=1.9, (b,x)=1.9} mutual-best keeps only
    (a,x)=2.0 where the optimum takes (a,y)+(b,x)=3.8). This is the
    assignment-problem formulation of record linkage (Jaro 1989 used
    exactly this LP for the Tampa census match).

    Distribution: assignment decomposes over CONNECTED COMPONENTS of
    the candidate graph (no edge crosses components), so the engine
    namespaces the bipartite nodes (2l vs 2r+1), labels components
    with the distributed CC stage, attaches the label with one
    bucketed hash join, and solves each component exactly with the
    in-repo O(n^3) Kuhn-Munkres (functions/evaluation.py
    _hungarian_matching) inside groupby(label).map_groups.
    Partitioning assumption: one component's candidate matrix fits a
    worker — components wider than OPTIMAL_MATCH_MAX_SIDE raise
    rather than silently going quadratic (upstream blocking caps are
    the fix, same contract as the graph-clustering family).

    Output (l_col, r_col, score_col): a 1:1 subset of the input
    pairs; rows with score <= 0 are never matched (equivalent to
    unmatched on a nonnegative matrix). Rows-only correctness
    surface: optimal assignment is not SQL-expressible — the solver
    is pytest-pinned against exhaustive permutation search and the
    improvement-over-greedy property (tests/test_optmatch.py)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.cc import components_labels
    from .evaluation import _hungarian_matching

    e = pairs.materialize()
    labels = components_labels(
        e.map_batches(
            lambda t: pa.table(
                {
                    "src": pc.multiply(
                        pc.cast(t[l_col], pa.int64()), pa.scalar(2)
                    ),
                    "dst": pc.add(
                        pc.multiply(
                            pc.cast(t[r_col], pa.int64()), pa.scalar(2)
                        ),
                        pa.scalar(1),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    src_pairs = e.map_batches(
        lambda t: t.append_column(
            "_src",
            pc.multiply(pc.cast(t[l_col], pa.int64()), pa.scalar(2)),
        ),
        batch_format="pyarrow",
    )
    tagged = bucket_join(
        src_pairs,
        labels,
        left_on="_src",
        right_on="node",
        left_schema={
            l_col: pa.int64(),
            r_col: pa.int64(),
            score_col: pa.float64(),
            "_src": pa.int64(),
        },
        right_schema={"node": pa.int64(), "label": pa.int64()},
        how="inner",
    )

    def solve(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([l_col, r_col], kind="mergesort")
        ls = g[l_col].to_numpy(dtype=np.int64)
        rs = g[r_col].to_numpy(dtype=np.int64)
        sc = g[score_col].to_numpy(dtype=np.float64)
        ul, li = np.unique(ls, return_inverse=True)
        ur, ri = np.unique(rs, return_inverse=True)
        if len(ul) > OPTIMAL_MATCH_MAX_SIDE or len(ur) > OPTIMAL_MATCH_MAX_SIDE:
            raise ValueError(
                f"optimal_matching component {len(ul)}x{len(ur)} "
                f"exceeds OPTIMAL_MATCH_MAX_SIDE="
                f"{OPTIMAL_MATCH_MAX_SIDE}; tighten upstream blocking"
            )
        M = np.zeros((len(ul), len(ur)), dtype=np.float64)
        # parallel duplicates keep the max score (conservative fold)
        np.maximum.at(M, (li, ri), sc)
        matched = _hungarian_matching(M)
        out_l = [int(ul[r]) for r, _c in matched]
        out_r = [int(ur[c]) for _r, c in matched]
        out_s = [float(M[r, c]) for r, c in matched]
        order = np.argsort(out_l, kind="stable")
        return pa.table(
            {
                l_col: pa.array(np.asarray(out_l)[order], pa.int64()),
                r_col: pa.array(np.asarray(out_r)[order], pa.int64()),
                score_col: pa.array(
                    np.round(np.asarray(out_s)[order], 6)
                ),
            }
        )

    return tagged.groupby("label").map_groups(
        solve, batch_format="pandas"
    )
