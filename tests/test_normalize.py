"""Normalization fallback chain semantics (reference parity)."""

import pyarrow as pa
import pytest

from bern_ray.sources import dicts
from bern_ray.stages.normalize import MentionNormalizer, build_lookup_tables


@pytest.fixture(scope="module")
def norm():
    return MentionNormalizer(build_lookup_tables())


def _mentions(surfaces):
    n = len(surfaces)
    return pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "mention_id": pa.array(range(n), type=pa.int64()),
            "etype": ["gene"] * n,
            "start": pa.array([0] * n, type=pa.int64()),
            "end": pa.array([1] * n, type=pa.int64()),
            "surface": pa.array(surfaces, type=pa.string()),
        }
    )


def test_exact_then_fold_then_lower(norm):
    i = 10  # some dict entry
    aliases = dicts.aliases_of(i)
    base = aliases[0]
    out = norm(
        _mentions(
            [
                base,  # exact
                base.upper(),  # exact (alias) or lower fallback
                base.replace(" ", "-"),  # tmchem fold collision
            ]
        )
    ).to_pylist()
    closure = dicts.merge_closure(dicts.build_oid_merge())
    want = closure.get(dicts.oid_of(i), dicts.oid_of(i))
    for r in out:
        assert r["oid"] == want, r


def test_gene_suffix_strip(norm):
    # gene alias without ' gene' in dict; query WITH suffix must hit
    i = next(
        j for j in range(dicts.N_OIDS) if j % 7 == 0 and j % 3 != 0
    )  # gene without explicit ' gene' alias
    base = dicts.aliases_of(i)[0]
    out = norm(_mentions([base + " gene"])).to_pylist()
    closure = dicts.merge_closure(dicts.build_oid_merge())
    want = closure.get(dicts.oid_of(i), dicts.oid_of(i))
    assert out[0]["oid"] == want


def test_mirna_pattern_rule(norm):
    out = norm(
        _mentions(["hsa-miR-21-5p", "hsa-mir-21-3p", "hsa-miR-21"])
    ).to_pylist()
    oids = {r["oid"] for r in out}
    assert oids == {"MI:hsa-mir-21"}, oids


def test_miss_is_cuiless(norm):
    out = norm(_mentions(["zzzznotindict999"])).to_pylist()
    assert out[0]["oid"] is None
    assert out[0]["ids"] == ["CUI-less"]


def test_merge_closure_applied(norm):
    # dict idx 7 merges into idx 0 (chain 14->7->0)
    a14 = dicts.aliases_of(14)[0]
    a7 = dicts.aliases_of(7)[0]
    a0 = dicts.aliases_of(0)[0]
    out = norm(_mentions([a14, a7, a0])).to_pylist()
    assert {r["oid"] for r in out} == {dicts.oid_of(0)}


def test_ids_include_bern_and_ext(norm):
    i = 3  # i%3==0 -> has meta
    base = dicts.aliases_of(i)[0]
    out = norm(_mentions([base])).to_pylist()[0]
    assert f"BERN:{out['oid']}" in out["ids"]
    assert any(x.startswith("MESH:") for x in out["ids"])
