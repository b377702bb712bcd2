"""Soundex phonetic blocking: canonical vectors, hypothesis fuzz of
the vectorized kernel vs the pure-Python reference, and the census
query vs its DuckDB oracle."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

# the canonical American Soundex test vectors (NARA / Knuth TAOCP v3)
CANONICAL = {
    "Robert": "R163",
    "Rupert": "R163",
    "Rubin": "R150",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Wu": "W000",
    "": "",
    "42": "",
    "a1ha": "A000",
}


def test_soundex_canonical_vectors():
    from bern_ray.functions.phonetic import soundex_array

    toks = list(CANONICAL)
    got = soundex_array(pa.array(toks, type=pa.string())).to_pylist()
    assert got == list(CANONICAL.values())


def test_soundex_reference_agrees_on_vectors():
    from bern_ray.functions.phonetic import soundex_reference

    for tok, code in CANONICAL.items():
        assert soundex_reference(tok) == code, tok


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=(),
                whitelist_characters=(
                    "abcdefghijklmnopqrstuvwxyz"
                    "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
                ),
            ),
            max_size=24,
        ),
        max_size=30,
    )
)
def test_soundex_kernel_fuzz(tokens):
    """The flat-buffer vectorized kernel is byte-identical to the
    per-token pure-Python reference on arbitrary alnum strings
    (including empties, digit-only and h/w-heavy cases)."""
    from bern_ray.functions.phonetic import (
        soundex_array,
        soundex_reference,
    )

    got = soundex_array(pa.array(tokens, type=pa.string())).to_pylist()
    assert got == [soundex_reference(t) for t in tokens]


def test_soundex_sliced_and_large_string():
    """Offset-carrying slices and large_string inputs read the raw
    buffers correctly (the r5 hardening contract)."""
    from bern_ray.functions.phonetic import soundex_array

    base = pa.array(
        ["xx", "Robert", "Tymczak", "wu"], type=pa.large_string()
    )
    got = soundex_array(base.slice(1, 3)).to_pylist()
    assert got == ["R163", "T522", "W000"]


def test_phonetic_blocking_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from bern_ray.functions.phonetic import (
        phonetic_blocking,
        phonetic_blocking_sql,
    )

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = (
        phonetic_blocking(docs)
        .to_pandas()
        .sort_values("soundex")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = (
        con.sql(phonetic_blocking_sql())
        .df()
        .sort_values("soundex")
        .reset_index(drop=True)
    )
    assert len(got) > 5
    assert got.soundex.tolist() == exp.soundex.tolist()
    assert got.n_tokens.tolist() == exp.n_tokens.astype(int).tolist()
    assert got.occurrences.tolist() == exp.occurrences.astype(int).tolist()
