"""The de-stringified pair-gen hot path (stages/blocking.py vocab
encoding + stages/scoring.py code path) must be OBSERVABLY identical
to the legacy string-carrying path — same pairs, same attrs, same
scores — while the shuffle itself ships only fixed-width ints.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bern_ray.pipelines.linkage import score_pairs
from bern_ray.stages.blocking import (
    AttrVocab,
    build_attr_vocab,
    candidate_pairs,
    explode_block_keys,
)


def _mentions_df(n_docs: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(11)
    surfaces = np.array(
        ["aspirin", "Aspirin", "ASA", "tylenol", "acetaminophen",
         "ibuprofen", "advil", "BRCA1", "brca-1", "p53"],
        dtype=object,
    )
    oid_of = {
        "aspirin": "MESH:D001241", "Aspirin": "MESH:D001241",
        "ASA": "MESH:D001241", "tylenol": "MESH:D000082",
        "acetaminophen": "MESH:D000082", "ibuprofen": "MESH:D007052",
        "advil": None, "BRCA1": "EntrezGene:672",
        "brca-1": None, "p53": "EntrezGene:7157",
    }
    rows = []
    mid = 0
    for d in range(n_docs):
        for s in rng.choice(surfaces, size=rng.integers(2, 6)):
            rows.append(
                {
                    "mention_id": mid,
                    "url": f"http://x/{d}",
                    "surface": str(s),
                    "oid": oid_of[str(s)],
                }
            )
            mid += 1
    return pd.DataFrame(rows)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = [
        "a_mid", "b_mid", "a_surface", "b_surface", "a_oid", "b_oid",
        "block_key", "score", "is_edge",
    ]
    return (
        df[cols]
        .sort_values(["a_mid", "b_mid", "block_key"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_code_path_matches_string_path(ray_session):
    ds = ray.data.from_pandas(_mentions_df()).repartition(4).materialize()
    vocab = build_attr_vocab(ds)
    assert vocab is not None
    s_str = score_pairs(
        candidate_pairs(ds, dedup=False, with_attrs=True), None
    ).to_pandas()
    s_cod = score_pairs(
        candidate_pairs(ds, dedup=False, with_attrs=True, vocab=vocab),
        None,
        vocab=vocab,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(s_str), _sorted(s_cod), check_dtype=False
    )


def test_exploded_rows_carry_only_ints(ray_session):
    """The whole point: nothing variable-width enters the pair sort."""
    df = _mentions_df(10)
    ds = ray.data.from_pandas(df).materialize()
    vocab = build_attr_vocab(ds)
    t = explode_block_keys(
        pa.Table.from_pandas(df, preserve_index=False),
        with_attrs=True,
        vocab=vocab,
    )
    for name in t.schema.names:
        assert not pa.types.is_string(t.schema.field(name).type), name
    assert "surface_c" in t.schema.names and "oid_c" in t.schema.names
    # codes round-trip through the vocab
    vs, _ = vocab.arrays()
    sc = t["surface_c"].to_numpy()
    assert set(vs[sc]) == set(df["surface"])


def test_vocab_declines_above_max_size(ray_session):
    ds = ray.data.from_pandas(_mentions_df(10)).materialize()
    assert build_attr_vocab(ds, max_size=3) is None


def test_oid_none_codes_roundtrip(ray_session):
    vocab = AttrVocab(
        np.array(["a", "b"], dtype=object),
        np.array(["X:1"], dtype=object),
    )
    batch = pa.table(
        {
            "mention_id": pa.array([0, 1], type=pa.int64()),
            "surface": pa.array(["a", "b"]),
            "oid": pa.array(["X:1", None]),
        }
    )
    t = explode_block_keys(batch, with_attrs=True, vocab=vocab)
    oc = t["oid_c"].to_numpy()
    mids = t["mention_id"].to_numpy(zero_copy_only=False)
    assert (oc[mids == 0] == 0).all()
    assert (oc[mids == 1] == -1).all()


def test_edges_emit_matches_decoded_projection(ray_session):
    """emit='edges' must be exactly the decoded output minus the
    string columns — same pairs, same scores, same edge decisions —
    on BOTH the code path and the string path."""
    ds = ray.data.from_pandas(_mentions_df()).repartition(4).materialize()
    vocab = build_attr_vocab(ds)

    def proj(df):
        return (
            df[["a_mid", "b_mid", "score", "is_edge"]]
            .sort_values(["a_mid", "b_mid", "score"], kind="mergesort")
            .reset_index(drop=True)
        )

    full = score_pairs(
        candidate_pairs(ds, dedup=False, with_attrs=True, vocab=vocab),
        None,
        vocab=vocab,
    ).to_pandas()
    lean = score_pairs(
        candidate_pairs(ds, dedup=False, with_attrs=True, vocab=vocab),
        None,
        vocab=vocab,
        emit="edges",
    ).to_pandas()
    assert list(lean.columns) == ["a_mid", "b_mid", "score", "is_edge"]
    pd.testing.assert_frame_equal(proj(full), proj(lean), check_dtype=False)

    lean_str = score_pairs(
        candidate_pairs(ds, dedup=False, with_attrs=True),
        None,
        emit="edges",
    ).to_pandas()
    pd.testing.assert_frame_equal(
        proj(full), proj(lean_str), check_dtype=False
    )
