"""Vectorized pairwise string-similarity kernels.

These are the numeric core of the pair-scoring stage (SURVEY.md §7.2
step 4) — the Ray-native analog of the reference's per-span scoring and
cross-type score duel (biobert_ner/ops.py:214-476). All kernels operate
on *arrays of pairs*: the only Python-level loops run over character
positions (bounded by `max_len`, default 48), never over rows, so a
batch of 100k pairs is a few hundred numpy passes.

Algorithms are the standard public definitions (Jaro 1989 /
Winkler 1990; Wagner-Fischer Levenshtein; hashed character-n-gram
count vectors + cosine).
"""

from __future__ import annotations

import numpy as np

MAX_LEN = 48  # surfaces are truncated to this many UTF-8 bytes for scoring
_PAD = 0


def encode_padded(strs, max_len: int = MAX_LEN) -> tuple[np.ndarray, np.ndarray]:
    """Encode strings to a (n, max_len) uint8 matrix (NUL-padded) + lengths.

    The per-row Python work is a single encode+copy; all O(len^2)
    similarity math downstream is vectorized.
    """
    n = len(strs)
    buf = bytearray(n * max_len)
    lens = np.empty(n, dtype=np.int32)
    for i, s in enumerate(strs):
        b = s.encode("utf-8")[:max_len] if s is not None else b""
        lens[i] = len(b)
        off = i * max_len
        buf[off : off + len(b)] = b
    mat = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(n, max_len)
    return mat, lens


def levenshtein(a_strs, b_strs, max_len: int = MAX_LEN) -> np.ndarray:
    """Pairwise Levenshtein distance; vectorized Wagner-Fischer.

    Python loop runs over positions of `a` only (<= max_len iterations),
    each iteration a handful of numpy ops over all pairs.
    """
    A, la = encode_padded(a_strs, max_len)
    B, lb = encode_padded(b_strs, max_len)
    n = A.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int32)
    # crop to the batch's true max lengths — the DP cost is O(maxA*maxB)
    A = A[:, : max(int(la.max()), 1)]
    B = B[:, : max(int(lb.max()), 1)]
    Lb = B.shape[1]
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int32), (n, Lb + 1)).copy()
    out = np.empty(n, dtype=np.int32)
    done_at_zero = la == 0
    out[done_at_zero] = lb[done_at_zero]
    max_la = int(la.max()) if n else 0
    col = np.arange(n)
    for i in range(1, max_la + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        mismatch = (B != A[:, i - 1 : i]).astype(np.int32)
        sub = prev[:, :-1] + mismatch
        dele = prev[:, 1:] + 1
        np.minimum(sub, dele, out=sub)
        # insertion needs a left-to-right scan: cur[j] = min(g[j], cur[j-1]+1)
        # with g = min(sub, del)  =>  cur[j] = j + min_{k<=j}(g[k]-k),
        # a cumulative minimum over (g[k]-k) seeded with g[0]=cur[:,0]=i.
        j = np.arange(1, Lb + 1, dtype=np.int32)
        tmp = sub - j
        tmp[:, 0] = np.minimum(tmp[:, 0], cur[:, 0])
        np.minimum.accumulate(tmp, axis=1, out=tmp)
        cur[:, 1:] = tmp + j
        sel = la == i
        if sel.any():
            out[sel] = cur[sel, lb[sel]]
        prev = cur
    return out


def damerau_levenshtein(
    a_strs, b_strs, max_len: int = MAX_LEN, chunk: int = 16384
) -> np.ndarray:
    """Pairwise FULL (unrestricted) Damerau-Levenshtein distance —
    the Lowrance-Wagner 1975 DP with the per-alphabet last-occurrence
    table, i.e. a transposition may span intervening edits (matches
    DuckDB's ``damerau_levenshtein``, fuzz-pinned 0/9000 mismatches in
    tests/test_similarity.py — NOT the restricted OSA variant, which
    disagrees on e.g. ('CA','ABC'): full=2, OSA=3).

    Vectorized over pairs like `levenshtein`: the Python loop runs over
    positions of `a` only; each row is ~10 numpy passes over all pairs
    (match mask, running-last-match-column, (n,256) last-row gather,
    transposition gather into the kept DP cube, and the same
    cumulative-minimum insertion trick). Unlike plain Levenshtein the
    transposition term reaches back to an arbitrary earlier cell
    d[k-1][l-1], so the full (n, La+2, Lb+2) int32 DP cube is kept;
    `chunk` bounds it to chunk*(max_len+2)^2*4 bytes (~160 MB at the
    defaults, transient per chunk)."""
    a_strs = list(a_strs)
    b_strs = list(b_strs)
    parts = [
        _dl_chunk(a_strs[st : st + chunk], b_strs[st : st + chunk], max_len)
        for st in range(0, len(a_strs), chunk)
    ]
    return (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.int32)
    )


def _dl_chunk(a_strs, b_strs, max_len: int) -> np.ndarray:
    A, la = encode_padded(a_strs, max_len)
    B, lb = encode_padded(b_strs, max_len)
    n = A.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int32)
    La = max(int(la.max()), 1)
    Lb = max(int(lb.max()), 1)
    A = A[:, :La]
    B = B[:, :Lb]
    INF = np.int32(La + Lb + 1)
    # Offset matrix (Lowrance-Wagner): DP cell (i, j) lives at
    # D[:, i+1, j+1]; row 0 / col 0 are the INF border so a
    # never-seen transposition anchor (k=0 or l=0) prices itself out
    # without special-casing.
    D = np.empty((n, La + 2, Lb + 2), dtype=np.int32)
    D[:, 0, :] = INF
    D[:, :, 0] = INF
    D[:, 1, 1:] = np.arange(Lb + 1, dtype=np.int32)
    D[:, 1:, 1] = np.arange(La + 1, dtype=np.int32)[None, :]
    da = np.zeros((n, 256), dtype=np.int32)  # last row of each byte in a
    idx = np.arange(n)
    jj = np.arange(1, Lb + 1, dtype=np.int32)
    for i in range(1, La + 1):
        match = B == A[:, i - 1 : i]  # (n, Lb); col j is 1-based
        # L[j] = last column j' < j matching a[i-1] (0 if none)
        run = np.maximum.accumulate(np.where(match, jj, 0), axis=1)
        L = np.concatenate(
            [np.zeros((n, 1), np.int32), run[:, :-1]], axis=1
        )
        K = da[idx[:, None], B]  # last row < i where b[j-1] appears in a
        cost = (~match).astype(np.int32)
        prev = D[:, i, :]
        sub = prev[:, 1 : Lb + 1] + cost
        dele = prev[:, 2 : Lb + 2] + 1
        trans = D[idx[:, None], K, L] + (i - K - 1) + 1 + (jj[None, :] - L - 1)
        g = np.minimum(np.minimum(sub, dele), trans)
        # insertion scan: cur[j] = min(g[j], cur[j-1]+1) with cur[0]=i
        # => cur[j] = j + cummin(g[k]-k), seeded with cur[0]-0 = i
        tmp = g - jj[None, :]
        tmp[:, 0] = np.minimum(tmp[:, 0], np.int32(i))
        np.minimum.accumulate(tmp, axis=1, out=tmp)
        D[:, i + 1, 0] = INF
        D[:, i + 1, 1] = i
        D[:, i + 1, 2:] = tmp + jj[None, :]
        da[idx, A[:, i - 1]] = i
    return D[idx, la + 1, lb + 1].astype(np.int32)


def levenshtein_sim(a_strs, b_strs, max_len: int = MAX_LEN) -> np.ndarray:
    """1 - dist / max_len_pair, in [0, 1]."""
    A_l = np.array([min(len(s.encode("utf-8")), max_len) for s in a_strs])
    B_l = np.array([min(len(s.encode("utf-8")), max_len) for s in b_strs])
    d = levenshtein(a_strs, b_strs, max_len).astype(np.float64)
    denom = np.maximum(np.maximum(A_l, B_l), 1)
    return 1.0 - d / denom


def jaro(a_strs, b_strs, max_len: int = MAX_LEN) -> np.ndarray:
    """Pairwise Jaro similarity, vectorized over pairs.

    The greedy match loop runs over positions of `a` (<= max_len
    iterations); matched-flag bookkeeping and the transposition count
    are pure numpy.
    """
    A, la = encode_padded(a_strs, max_len)
    B, lb = encode_padded(b_strs, max_len)
    n = A.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.float64)
    L = max(int(la.max()), int(lb.max()), 1)
    A = A[:, :L]
    B = B[:, :L]
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)  # match window
    jidx = np.arange(L, dtype=np.int32)
    matched_b = np.zeros((n, L), dtype=bool)
    match_a = np.zeros((n, L), dtype=bool)  # which a-positions matched, in order
    rows = np.arange(n)
    max_la = int(la.max())
    for i in range(max_la):
        active = la > i
        lo = i - win
        hi = i + win
        cand = (
            (B == A[:, i : i + 1])
            & (jidx >= lo[:, None])
            & (jidx <= hi[:, None])
            & (jidx < lb[:, None])
            & ~matched_b
            & active[:, None]
        )
        has = cand.any(axis=1)
        first_j = cand.argmax(axis=1)
        sel = rows[has]
        matched_b[sel, first_j[has]] = True
        match_a[sel, i] = True
    m = match_a.sum(axis=1).astype(np.float64)
    # chars of a at matched positions, in a-order; chars of b at matched
    # positions, in b-order. argsort(~mask, stable) packs matched first.
    orderA = np.argsort(~match_a, axis=1, kind="stable")
    orderB = np.argsort(~matched_b, axis=1, kind="stable")
    packedA = np.take_along_axis(A, orderA, axis=1)
    packedB = np.take_along_axis(B, orderB, axis=1)
    k = np.arange(L)
    valid = k[None, :] < m[:, None]
    # transpositions = HALF the mismatched packed positions, with the
    # classic strcmp95 INTEGER halving (an odd mismatch count floors:
    # 3 -> 1, not 1.5) — this is what DuckDB's
    # jaro_winkler_similarity and the C lineage implement, and the
    # fuzzy-join oracle (SQL_FUZZY_JOIN_NAMES) verifies the kernels
    # bit-for-bit against each other
    trans = (
        ((packedA != packedB) & valid).sum(axis=1) // 2
    ).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (
            m / np.maximum(la, 1)
            + m / np.maximum(lb, 1)
            + (m - trans) / np.where(m > 0, m, 1)
        ) / 3.0
    j = np.where(m > 0, j, 0.0)
    both_empty = (la == 0) & (lb == 0)
    j = np.where(both_empty, 1.0, j)
    return j


def jaro_winkler(
    a_strs, b_strs, p: float = 0.1, max_prefix: int = 4, max_len: int = MAX_LEN
) -> np.ndarray:
    """Jaro-Winkler: Jaro boosted by the length of the common prefix."""
    jj = jaro(a_strs, b_strs, max_len)
    A, la = encode_padded(a_strs, max_prefix)
    B, lb = encode_padded(b_strs, max_prefix)
    lim = np.minimum(np.minimum(la, lb), max_prefix)
    eq = A == B
    k = np.arange(max_prefix)
    eq &= k[None, :] < lim[:, None]
    # common prefix length = count of leading True
    cp = np.where(eq.all(axis=1), lim, eq.argmin(axis=1))
    # classic Winkler BOOST THRESHOLD: the prefix bonus applies only
    # when jaro exceeds 0.7 (strcmp95 lineage; DuckDB implements the
    # same rule — the fuzzy-join oracle pins the two kernels equal)
    return np.where(jj > 0.7, jj + cp * p * (1.0 - jj), jj)


def ngram_hash_vectors(
    strs, dim: int = 128, n: int = 3, max_len: int = MAX_LEN
) -> np.ndarray:
    """Hashed character-n-gram count vectors, L2-normalized.

    This is the deterministic 'embedding' used by the pair scorer's
    cosine component (north_star: embedding-cosine ensemble) and by the
    embedding-near-dup / ANN helpers when no learned embedding column
    exists. Fully vectorized: trigram codes via shifted byte matrices,
    scatter via one flat bincount.
    """
    A, la = encode_padded(strs, max_len)
    nrows = A.shape[0]
    if nrows == 0:
        return np.zeros((0, dim), dtype=np.float32)
    L = max(int(la.max()), n)
    A = A[:, :L]
    a = A.astype(np.int64)
    codes = np.zeros((nrows, L - n + 1), dtype=np.int64)
    for k in range(n):
        codes = codes * 256 + a[:, k : L - n + 1 + k]
    pos = np.arange(L - n + 1)
    valid = pos[None, :] < np.maximum(la[:, None] - n + 1, 0)
    h = (codes * 2654435761) % dim
    flat = (np.arange(nrows)[:, None] * dim + h)[valid]
    vec = np.bincount(flat, minlength=nrows * dim).astype(np.float32)
    vec = vec.reshape(nrows, dim)
    norms = np.sqrt(np.einsum("ij,ij->i", vec, vec))[:, None]
    np.divide(vec, norms, out=vec, where=norms > 0)
    return vec


def cosine_pairs(E1: np.ndarray, E2: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two equal-shape (n, d) matrices."""
    return np.einsum("ij,ij->i", E1, E2)


def affine_gap_sim(
    a_strs,
    b_strs,
    *,
    match: float = 1.0,
    mismatch: float = -1.0,
    gap_open: float = 1.0,
    gap_extend: float = 0.1,
    max_len: int = MAX_LEN,
) -> np.ndarray:
    """Pairwise affine-gap global-alignment similarity (Gotoh 1982) —
    the string measure the learnable-ER literature (Bilenko & Mooney,
    KDD 2003) prefers over plain edit distance: a CONTIGUOUS run of
    inserted/deleted characters costs gap_open + (k-1)*gap_extend
    instead of k, so truncations and inserted tokens ("Smith" vs
    "Smith, Dr.") are punished once, not per character.

    Vectorized like `levenshtein` above: the Python loop runs over
    positions of `a` only; each row is a handful of numpy ops over
    all pairs x all positions of `b`. The horizontal-gap row
    E[i][j] = max(H[i][j-1] - go, E[i][j-1] - ge) unrolls to a
    running max over the same row's NO-HORIZONTAL-GAP candidates
    D[k] (diagonal or vertical-gap entries): a path re-entering
    through E[i][k] pays go where staying in the gap pays ge, so
    with go >= ge (asserted) it never wins — the same
    cummax-with-slope trick the Levenshtein insertion scan uses,
    here with v[k] = D[k] + k*ge accumulated by np.maximum.

    Returned similarity = align_score / (match * max(la, lb)),
    clipped to [0, 1]; identical strings score exactly 1.0. Empty vs
    empty scores 1.0; empty vs non-empty 0.0 (one all-gap run,
    clipped). Gap costs are POSITIVE magnitudes."""
    if gap_open < gap_extend:
        raise ValueError("affine gaps need gap_open >= gap_extend")
    A, la = encode_padded(a_strs, max_len)
    B, lb = encode_padded(b_strs, max_len)
    n = A.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A = A[:, : max(int(la.max()), 1)]
    B = B[:, : max(int(lb.max()), 1)]
    Lb = B.shape[1]
    NEG = -1e18
    j = np.arange(Lb + 1, dtype=np.float64)
    # global boundary: H[0][0] = 0, H[0][j>=1] = -(go + (j-1)*ge)
    H_prev = np.empty((n, Lb + 1), dtype=np.float64)
    H_prev[:, 0] = 0.0
    H_prev[:, 1:] = -(gap_open + (j[1:] - 1) * gap_extend)
    F_prev = np.full((n, Lb + 1), NEG, dtype=np.float64)
    scores = np.zeros(n, dtype=np.float64)
    rows = np.arange(n)
    zero = la == 0
    scores[zero] = H_prev[zero, lb[zero]]
    max_la = int(la.max())
    for i in range(1, max_la + 1):
        # vertical gap (consuming a_i): open from H or extend F
        F_cur = np.maximum(H_prev - gap_open, F_prev - gap_extend)
        s = np.where(B == A[:, i - 1 : i], match, mismatch)
        diag = H_prev[:, :-1] + s
        D = np.maximum(diag, F_cur[:, 1:])  # no-horizontal-gap, j>=1
        h0 = -(gap_open + (i - 1) * gap_extend)
        src = np.empty((n, Lb + 1), dtype=np.float64)
        src[:, 0] = h0  # k = 0 source is the column-0 boundary
        src[:, 1:] = D
        v = src + j * gap_extend
        np.maximum.accumulate(v, axis=1, out=v)
        E = v[:, :-1] - gap_open - (j[1:] - 1) * gap_extend
        H_cur = np.empty((n, Lb + 1), dtype=np.float64)
        H_cur[:, 0] = h0
        H_cur[:, 1:] = np.maximum(D, E)
        sel = la == i
        if sel.any():
            scores[sel] = H_cur[rows[sel], lb[sel]]
        H_prev = H_cur
        F_prev = F_cur
    denom = match * np.maximum(np.maximum(la, lb), 1).astype(np.float64)
    sim = scores / denom
    both_empty = (la == 0) & (lb == 0)
    sim[both_empty] = 1.0
    return np.clip(sim, 0.0, 1.0)


# --- slow scalar references, used only by the unit tests ---------------


def _jaro_scalar(s1: str, s2: str) -> float:
    a, b = s1.encode(), s2.encode()
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    win = max(max(la, lb) // 2 - 1, 0)
    mb = [False] * lb
    ma = []
    for i in range(la):
        lo, hi = max(0, i - win), min(lb - 1, i + win)
        for j in range(lo, hi + 1):
            if not mb[j] and b[j] == a[i]:
                mb[j] = True
                ma.append(i)
                break
    m = len(ma)
    if m == 0:
        return 0.0
    bm = [b[j] for j in range(lb) if mb[j]]
    am = [a[i] for i in ma]
    t = sum(x != y for x, y in zip(am, bm)) // 2  # strcmp95 halving
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_winkler_scalar(s1: str, s2: str, p: float = 0.1) -> float:
    j = _jaro_scalar(s1, s2)
    if j <= 0.7:  # Winkler boost threshold (strcmp95 lineage)
        return j
    cp = 0
    for x, y in zip(s1.encode()[:4], s2.encode()[:4]):
        if x != y:
            break
        cp += 1
    return j + cp * p * (1 - j)


def _levenshtein_scalar(s1: str, s2: str) -> int:
    a, b = s1.encode(), s2.encode()
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[len(b)]


def _damerau_levenshtein_scalar(s1: str, s2: str) -> int:
    """Textbook Lowrance-Wagner full DL (dict last-occurrence table),
    the independent scalar reference `damerau_levenshtein` is fuzzed
    against (alongside DuckDB's built-in)."""
    a, b = s1.encode("utf-8")[:MAX_LEN], s2.encode("utf-8")[:MAX_LEN]
    la, lb = len(a), len(b)
    inf = la + lb + 1
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da: dict[int, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ll = db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ll] + (i - k - 1) + 1 + (j - ll - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _affine_gap_scalar(
    s1: str,
    s2: str,
    match: float = 1.0,
    mismatch: float = -1.0,
    gap_open: float = 1.0,
    gap_extend: float = 0.1,
) -> float:
    """Textbook Gotoh three-matrix DP (H / E horizontal / F vertical),
    O(len^2) scalar — the independent reference affine_gap_sim is
    fuzzed against."""
    a, b = s1.encode("utf-8")[:MAX_LEN], s2.encode("utf-8")[:MAX_LEN]
    la, lb = len(a), len(b)
    NEG = -1e18
    H = [[0.0] * (lb + 1) for _ in range(la + 1)]
    E = [[NEG] * (lb + 1) for _ in range(la + 1)]
    F = [[NEG] * (lb + 1) for _ in range(la + 1)]
    for jj in range(1, lb + 1):
        H[0][jj] = -(gap_open + (jj - 1) * gap_extend)
    for ii in range(1, la + 1):
        H[ii][0] = -(gap_open + (ii - 1) * gap_extend)
    for ii in range(1, la + 1):
        for jj in range(1, lb + 1):
            E[ii][jj] = max(
                H[ii][jj - 1] - gap_open, E[ii][jj - 1] - gap_extend
            )
            F[ii][jj] = max(
                H[ii - 1][jj] - gap_open, F[ii - 1][jj] - gap_extend
            )
            sc = match if a[ii - 1] == b[jj - 1] else mismatch
            H[ii][jj] = max(
                H[ii - 1][jj - 1] + sc, E[ii][jj], F[ii][jj]
            )
    if la == 0 and lb == 0:
        return 1.0
    sim = H[la][lb] / (match * max(la, lb, 1))
    return min(max(sim, 0.0), 1.0)
