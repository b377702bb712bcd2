"""Vectorized American Soundex phonetic blocking keys.

Phonetic blocking is the classic complement to string-distance and
fold-key blocking in entity resolution (Odell & Russell's Soundex,
public domain, standard since 1930-census record linkage): surface
variants that SOUND alike land in the same block even when edit
distance is large. It extends the reference's blocking-key family —
the tmChem fold key (chemical_normalizer.py:64-72) and ' gene'-suffix
fold (normalize.py:538-548) are the reference's lexical analogs.

Soundex spec implemented (American Soundex):
  code = first letter + 3 digits (0-padded), letters map
  BFPV->1 CGJKQSXZ->2 DT->3 L->4 MN->5 R->6; vowels A E I O U Y
  separate runs (then vanish); H and W are TRANSPARENT (equal codes
  merge across them); runs of equal codes collapse to one digit; the
  first letter's own run is consumed by the letter itself. Tokens
  with no ASCII letter get "" (excluded from blocking).

The kernel is one 256-byte-LUT pass over the raw Arrow string buffer
per batch — segment-aware numpy masks end to end, no per-row Python.
Exactly mirrored by the DuckDB translate/regexp pipeline in
phonetic_blocking_sql() (RE2 has no backreferences, so the
run-collapse is one regexp_replace per digit class, composed
programmatically). Pinned on the canonical vectors (Robert/Rupert
R163, Ashcraft A261, Tymczak T522, Pfister P236, Honeyman H555) plus
a hypothesis fuzz against a pure-Python per-token reference
(tests/test_phonetic.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .textstats import _as_string_array, _explode_tokens

# byte -> soundex code; 255 = not a letter (dropped before coding)
_SX_CODE = np.full(256, 255, dtype=np.uint8)
for _grp, _code in [
    (b"aeiouy", 0),
    (b"bfpv", 1),
    (b"cgjkqsxz", 2),
    (b"dt", 3),
    (b"l", 4),
    (b"mn", 5),
    (b"r", 6),
    (b"hw", 7),
]:
    for _b in _grp:
        _SX_CODE[_b] = _code
        _SX_CODE[_b - 32] = _code  # uppercase
del _grp, _code, _b

_IS_LOWER = np.zeros(256, dtype=bool)
for _b in b"abcdefghijklmnopqrstuvwxyz":
    _IS_LOWER[_b] = True
del _b


def soundex_array(tokens) -> pa.Array:
    """American Soundex of each string — one vectorized pass.

    Returns a StringArray of 4-char codes; strings containing no
    ASCII letter map to "" (nulls are treated as ""). Non-letter
    bytes (digits, punctuation, UTF-8 continuation bytes) are
    stripped BEFORE coding, so H/W transparency and run-collapse act
    on the letter sequence, matching the SQL mirror's
    regexp_replace('[^a-z]','') prepass.
    """
    arr = _as_string_array(tokens)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offs[0] : offs[-1]
    ]
    offs = offs - offs[0]
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))

    codes_all = _SX_CODE[data]
    alpha = codes_all != 255
    fb = data[alpha]
    fseg = seg[alpha]
    fcodes = codes_all[alpha]
    out = np.full((n, 4), ord("0"), dtype=np.uint8)
    has_letter = np.zeros(n, dtype=bool)
    if len(fb):
        # first letter per segment (uppercased into column 0)
        first_mask = np.empty(len(fb), dtype=bool)
        first_mask[0] = True
        first_mask[1:] = fseg[1:] != fseg[:-1]
        useg = fseg[first_mask]
        has_letter[useg] = True
        first_bytes = fb[first_mask]
        out[useg, 0] = np.where(
            _IS_LOWER[first_bytes], first_bytes - 32, first_bytes
        )
        # 1. drop H/W (code 7) — the first-letter flag survives only
        #    when the first letter itself is not H/W, which is exactly
        #    when its run must be consumed below
        m1 = fcodes != 7
        c2, seg2, isf2 = fcodes[m1], fseg[m1], first_mask[m1]
        if len(c2):
            # 2. collapse runs of equal codes within a segment
            dup = np.empty(len(c2), dtype=bool)
            dup[0] = False
            dup[1:] = (c2[1:] == c2[:-1]) & (seg2[1:] == seg2[:-1])
            keep = ~dup
            c3, seg3, isf3 = c2[keep], seg2[keep], isf2[keep]
            # 3. drop the first letter's (collapsed) run, then vowels
            md = (~isf3) & (c3 != 0)
            digits, segd = c3[md], seg3[md]
            if len(digits):
                # 4. first 3 digits per segment
                new_d = np.empty(len(segd), dtype=bool)
                new_d[0] = True
                new_d[1:] = segd[1:] != segd[:-1]
                starts = np.flatnonzero(new_d)
                sizes = np.diff(np.append(starts, len(segd)))
                rank = np.arange(len(segd), dtype=np.int64) - np.repeat(
                    starts, sizes
                )
                take = rank < 3
                out[segd[take], 1 + rank[take]] = digits[take] + ord("0")

    lens = np.where(has_letter, 4, 0).astype(np.int32)
    new_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=new_offs[1:])
    values = out[has_letter].ravel()
    return pa.StringArray.from_buffers(
        n,
        pa.py_buffer(new_offs.tobytes()),
        pa.py_buffer(values.tobytes()),
    )


def soundex_reference(token: str) -> str:
    """Pure-Python per-token reference for the fuzz pin (not used in
    any pipeline)."""
    letters = [c for c in token.lower() if "a" <= c <= "z"]
    if not letters:
        return ""
    first = letters[0].upper()
    codes = [int(_SX_CODE[ord(c)]) for c in letters]
    c2 = [c for c in codes if c != 7]
    c3 = [c for i, c in enumerate(c2) if i == 0 or c != c2[i - 1]]
    tail = c3[1:] if codes[0] != 7 else c3
    digits = [str(c) for c in tail if c != 0][:3]
    return first + "".join(digits).ljust(3, "0")


def phonetic_blocking(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """-> (soundex, n_tokens, occurrences): the corpus's phonetic
    block-key census — distinct tokens and total occurrences per
    Soundex code.

    Shuffle shape: per-batch value_counts partial -> groupby(token)
    sum (the token_freq idiom — one row per (batch, token) moves, not
    one per occurrence), then the Soundex kernel over the DISTINCT
    token table and a second groupby on the ~#codes-sized key set
    with per-batch partial combines. Both shuffles are pre-reduced;
    nothing is driver-sized.
    """

    def partial(t: pa.Table) -> pa.Table:
        _, toks = _explode_tokens(t["text"])
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "partial": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    tf = docs.map_batches(partial, batch_format="pyarrow").groupby(
        "token"
    ).sum("partial")

    def code_partial(t: pa.Table) -> pa.Table:
        sx = soundex_array(t["token"])
        tbl = pa.table({"soundex": sx, "cnt": t["sum(partial)"]})
        tbl = tbl.filter(pc.not_equal(tbl["soundex"], ""))
        g = tbl.group_by("soundex").aggregate(
            [("cnt", "sum"), ("cnt", "count")]
        )
        return pa.table(
            {
                "soundex": g["soundex"],
                "occ_part": g["cnt_sum"],
                "tok_part": pc.cast(g["cnt_count"], pa.int64()),
            }
        )

    agg = tf.map_batches(code_partial, batch_format="pyarrow").groupby(
        "soundex"
    ).aggregate(
        ray.data.aggregate.Sum("tok_part", alias_name="n_tokens"),
        ray.data.aggregate.Sum("occ_part", alias_name="occurrences"),
    )
    return agg


def phonetic_blocking_sql() -> str:
    """DuckDB mirror of phonetic_blocking over `documents`. RE2 has no
    backreferences, so the run-collapse is one regexp_replace per
    digit class (0-6; 7s are already stripped)."""
    collapse = "replace(cod, '7', '')"
    for d in range(7):
        collapse = (
            f"regexp_replace({collapse}, '{d}{{2,}}', '{d}', 'g')"
        )
    return f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[0-9a-zA-Z]+')) AS token
  FROM documents
),
tf AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
u AS (
  SELECT token, cnt,
         upper(regexp_replace(token, '[^a-z]', '', 'g')) AS ul
  FROM tf WHERE regexp_matches(token, '[a-z]')
),
c AS (
  SELECT cnt, substr(ul, 1, 1) AS f,
         translate(ul, 'AEIOUYHWBFPVCGJKQSXZDTLMNR',
                       '00000077111122222222334556') AS cod
  FROM u
),
d AS (
  SELECT cnt, f, {collapse} AS c3, substr(cod, 1, 1) AS fc
  FROM c
),
sx AS (
  SELECT cnt,
         f || rpad(substr(replace(
             CASE WHEN fc = '7' THEN c3 ELSE substr(c3, 2) END,
             '0', ''), 1, 3), 3, '0') AS soundex
  FROM d
)
SELECT soundex, count(*) AS n_tokens, sum(cnt) AS occurrences
FROM sx GROUP BY soundex
"""
