"""Fold + key-function golden tests (FIXTURES.md §6 items 1-2).

The fold spec is frozen (core/fold.py); these tests pin it against
DuckDB's SQL rendering so the Ray pipeline and the oracle can never
drift apart, and against hand-built unicode edge cases mirroring the
reference's preprocess (convert.py:301-348, server.py:338-370).
"""

import duckdb
import pyarrow as pa
import pytest

from bern_ray.core.fold import (
    MAX_WORD_LEN,
    fold_sql,
    fold_text,
    fold_text_str,
    strip_gene_suffix,
    tmchem_key,
    tmchem_key_str,
    tmchem_sql,
)

CASES = [
    "plain ascii text",
    "crlf\r\nline",
    "tab\there",
    "cr-space\r pair",
    "nbsp space",
    "thin space",
    "hair space",
    "em en four ",
    "bom﻿mid",
    "pua chars",
    "eta degree",
    "long " + "x" * 75 + " word",
    "exactly " + "y" * MAX_WORD_LEN + " fifty",
    "",
    "   ",
    "mixed\r\n\t  " + "z" * 60,
]


def test_fold_matches_duckdb_sql():
    con = duckdb.connect()
    sql = f"SELECT {fold_sql('s')} AS f FROM t"
    con.register("t", pa.table({"s": CASES}))
    got_sql = [r[0] for r in con.sql(sql).fetchall()]
    got_py = fold_text(pa.array(CASES, type=pa.string())).to_pylist()
    assert got_py == got_sql


def test_fold_edge_semantics():
    assert fold_text_str("a\r\nb") == "a b"
    assert fold_text_str("a b") == "a b"
    assert fold_text_str("") == "Η"
    assert fold_text_str("") == "°"
    long = fold_text_str("x" * 80)
    assert long == "x" * MAX_WORD_LEN
    # idempotence: folding folded text is a no-op
    for c in CASES:
        f = fold_text_str(c)
        assert fold_text_str(f) == f


def test_tmchem_key():
    assert tmchem_key_str("Hello-World 42!") == "helloworld42"
    assert tmchem_key_str("ZOR vax") == tmchem_key_str("zor-VAX")
    con = duckdb.connect()
    con.register("t", pa.table({"s": CASES}))
    got_sql = [
        r[0] for r in con.sql(f"SELECT {tmchem_sql('s')} FROM t").fetchall()
    ]
    got_py = tmchem_key(pa.array(CASES, type=pa.string())).to_pylist()
    assert got_py == got_sql


def test_strip_gene_suffix():
    arr = pa.array(["abc gene", "abc GENE", "gene", "abc genes"])
    assert strip_gene_suffix(arr).to_pylist() == [
        "abc",
        "abc",
        "gene",
        "abc genes",
    ]
