"""Byte-level kernel parity: the zero-copy tokenize/hash/trigram
kernels in functions/textstats.py must match their per-row regex
references on arbitrary unicode, and must read int64-offset
(large_string) and sliced inputs correctly — raw-buffer readers fail
silently if offsets are misparsed, so parity is property-tested."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from bern_ray.functions.textstats import (
    TOKEN_RE,
    _explode_tokens,
    _tf_rows,
    _token_h64,
    _trigram_hash_counts,
)

_tok_re = re.compile(TOKEN_RE)


def _ref_tokens(texts):
    """The pre-vectorization reference: regex findall per lowered row
    (same Arrow lowering, so only the scan is under test)."""
    low = pc.utf8_lower(pa.array(texts, type=pa.string()))
    out = []
    for i, s in enumerate(low.to_pylist()):
        for tok in _tok_re.findall(s or ""):
            out.append((i, tok))
    return out


texts_strategy = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=40),
        # dense alnum/separator mixes hit run-boundary edges hard
        st.text(alphabet="a1 .é̇ß\n\t-", max_size=40),
    ),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(texts_strategy)
def test_explode_tokens_matches_regex(texts):
    parent, toks = _explode_tokens(pa.array(texts, type=pa.string()))
    got = list(zip(parent.tolist(), toks.to_pylist()))
    assert got == _ref_tokens(texts)


@settings(max_examples=100, deadline=None)
@given(texts_strategy)
def test_tf_rows_matches_counter(texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = _tf_rows(t).to_pandas()
    got = {
        (r.doc_id, r.token): r.tf for r in out.itertuples(index=False)
    }
    ref = Counter(_ref_tokens(texts))
    assert got == dict(ref)


def test_explode_tokens_large_string_and_slice():
    texts = ["Alpha beta", None, "", "Gamma42 delta", "x"]
    plain = pa.array(texts, type=pa.string())
    big = pa.array(texts, type=pa.large_string())
    p_par, p_tok = _explode_tokens(plain)
    b_par, b_tok = _explode_tokens(big)
    assert p_par.tolist() == b_par.tolist()
    assert p_tok.to_pylist() == b_tok.to_pylist()
    # sliced (offset != 0) array must not re-read the dropped prefix
    s_par, s_tok = _explode_tokens(plain.slice(2))
    assert s_tok.to_pylist() == ["gamma42", "delta", "x"]
    assert s_par.tolist() == [1, 1, 2]
    # chunked input with an empty chunk
    ch = pa.chunked_array([plain.slice(0, 2), plain.slice(2, 0),
                           plain.slice(2)])
    c_par, c_tok = _explode_tokens(ch)
    assert c_tok.to_pylist() == p_tok.to_pylist()
    assert c_par.tolist() == p_par.tolist()


def test_token_h64_layout_invariance():
    toks = ["alpha", "beta", "alpha", "x" * 40, "x" * 40 + "y", ""]
    plain = pa.array(toks, type=pa.string())
    h = _token_h64(plain)
    # equal tokens hash equal; the hash keys a co-location join
    assert h[0] == h[2]
    # same values through large_string, slice and chunked layouts
    assert _token_h64(pa.array(toks, type=pa.large_string())).tolist() \
        == h.tolist()
    assert _token_h64(plain.slice(1)).tolist() == h[1:].tolist()
    assert _token_h64(
        pa.chunked_array([plain.slice(0, 3), plain.slice(3)])
    ).tolist() == h.tolist()
    # >32-byte tokens truncate their byte scan but mix the TRUE
    # length, so prefix-sharing 40- and 41-byte tokens still separate
    assert h[3] != h[4]


def test_trigram_counts_large_string_parity():
    texts = ["the cat sat", "", None, "un deux trois", "汉字 abc"]
    a = _trigram_hash_counts(pa.array(texts, type=pa.string()))
    b = _trigram_hash_counts(pa.array(texts, type=pa.large_string()))
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
