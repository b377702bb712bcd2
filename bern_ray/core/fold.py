"""Canonical text fold + normalization-key scalar functions.

This module freezes ONE byte-deterministic text fold that unifies the
reference's three disagreeing rule sets (SURVEY.md §2.2 M1-M3):

- unicode whitespace / PUA folding  (reference: convert.py:301-348)
- CRLF / LF / TAB -> space and >50-char word truncation
  (reference: server.py:338-370, max_word_len server.py:671-672)
- download-side whitespace collapse (reference: download.py:654-660)

Every producer and consumer of the `text` column (page synthesis, html
extraction, blocking keys, oracle SQL) goes through `fold_text` /
`FOLD_SQL`, which is the per-row invariant required by
BASELINE.json.input_hint ("byte-identical extracted text per url").

Key functions mirror the reference's normalizer key rules:

- `tmchem_key`   : lowercase + strip all non-alphanumerics
  (reference: normalizers/chemical_normalizer.py:64-72)
- `lower_key`    : plain lowercase fallback
  (reference: normalizers/species_normalizer.py:47-52)
- `strip_gene_suffix`: drop a trailing " gene" before lookup
  (reference: normalize.py:538-548)
- `species_taxid`: oid//100 -> "NCBI:txid{}" projection
  (reference: normalize.py:488-493)

All functions are vectorized over Arrow arrays (pyarrow.compute); no
per-row Python in the hot path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

MAX_WORD_LEN = 50  # reference: server.py:671-672

# Ordered substring replacements. Order matters: multi-char rules first.
# Codepoint list per reference convert.py:301-348 (spec, not code).
FOLD_RULES: list[tuple[str, str]] = [
    ("\r\n", " "),
    ("\r ", " "),
    ("\r", " "),
    ("\n", " "),
    ("\t", " "),
    ("\u2028", " "),  # LINE SEPARATOR
    ("\u2029", " "),  # PARAGRAPH SEPARATOR
    ("\u200A", " "),  # HAIR SPACE
    ("\u2009", " "),  # THIN SPACE
    ("\u2008", " "),  # PUNCTUATION SPACE
    ("\u2005", " "),  # FOUR-PER-EM SPACE
    ("\u2004", " "),  # THREE-PER-EM SPACE
    ("\u2003", " "),  # EM SPACE
    ("\u2002", " "),  # EN SPACE
    ("\u00A0", " "),  # NO-BREAK SPACE
    ("\uF8FF", " "),  # Apple PUA
    ("\u202F", " "),  # NARROW NO-BREAK SPACE
    ("\uFEFF", " "),  # BOM / zero-width no-break space
    ("\uF044", " "),  # PUA
    ("\uF02D", " "),  # PUA
    ("\uF0BB", " "),  # PUA
    ("\uF048", "\u0397"),  # PUA -> GREEK CAPITAL LETTER ETA
    ("\uF0B0", "\u00B0"),  # PUA -> DEGREE SIGN
]

# Words longer than MAX_WORD_LEN keep only their first MAX_WORD_LEN chars.
_TRUNC_PATTERN = r"(\S{%d})\S+" % MAX_WORD_LEN
_TRUNC_REPLACEMENT = r"\1"


def fold_text(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Apply the frozen canonical fold to a string array (vectorized)."""
    for pat, rep in FOLD_RULES:
        arr = pc.replace_substring(arr, pattern=pat, replacement=rep)
    arr = pc.replace_substring_regex(
        arr, pattern=_TRUNC_PATTERN, replacement=_TRUNC_REPLACEMENT
    )
    return arr


def fold_text_str(s: str) -> str:
    """Scalar convenience wrapper (tests / fixture generation only)."""
    return fold_text(pa.array([s])).to_pylist()[0]


def fold_sql(col: str) -> str:
    """DuckDB SQL expression computing exactly `fold_text(col)`.

    Used by the oracle side so both engines share one frozen spec.
    """
    expr = col
    for pat, rep in FOLD_RULES:
        expr = "replace({}, '{}', '{}')".format(expr, pat.replace("'", "''"), rep)
    return "regexp_replace({}, '(\\S{{{}}})\\S+', '\\1', 'g')".format(
        expr, MAX_WORD_LEN
    )


def tmchem_key(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Blocking/normalization key: lowercase + drop all non-[0-9a-z]."""
    return pc.replace_substring_regex(
        pc.utf8_lower(arr), pattern="[^0-9a-z]+", replacement=""
    )


def tmchem_key_str(s: str) -> str:
    return tmchem_key(pa.array([s])).to_pylist()[0]


def tmchem_sql(col: str) -> str:
    """DuckDB SQL equivalent of `tmchem_key(col)`."""
    return "regexp_replace(lower({}), '[^0-9a-z]+', '', 'g')".format(col)


def lower_key(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    return pc.utf8_lower(arr)


def strip_gene_suffix(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Drop a trailing ' gene' (case-insensitive) from the surface form."""
    return pc.replace_substring_regex(
        arr, pattern=r"(?i) gene$", replacement=""
    )


def species_taxid(oid_num: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Project a numeric species oid to its NCBI taxonomy id string."""
    tax = pc.divide(pc.cast(oid_num, pa.int64()), pa.scalar(100, pa.int64()))
    return pc.binary_join_element_wise(
        pa.array(["NCBI:txid"] * len(oid_num)).cast(pa.string())
        if not isinstance(oid_num, pa.ChunkedArray)
        else pa.chunked_array([["NCBI:txid"] * len(oid_num)]).cast(pa.string()),
        pc.cast(tax, pa.string()),
        "",
    )


# Species surfaces that must never become entities — the reference's
# human-synonym stoplist (utils.py:269-276, applied utils.py:279-308).
SPECIES_STOPLIST = frozenset(
    "person|infant|Child|people|participants|woman|"
    "Girls|Man|Peoples|Men|Participant|Patients|"
    "humans|Persons|mans|participant|Infants|Boys|"
    "Human|Humans|Women|children|Mans|child|Participants|Girl|"
    "Infant|girl|patient|patients|boys|men|infants|"
    "man|girls|Children|Boy|women|persons|human|Woman|"
    "peoples|Patient|People|boy|Person".split("|")
)
