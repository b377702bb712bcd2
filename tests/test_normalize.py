"""Normalization fallback chain semantics (reference parity)."""

import pyarrow as pa
import pytest

from bern_ray.sources import dicts
from bern_ray.stages.normalize import MentionNormalizer, build_lookup_tables


@pytest.fixture(scope="module")
def norm():
    return MentionNormalizer(build_lookup_tables())


def _mentions(surfaces, etype="gene"):
    n = len(surfaces)
    etypes = [etype] * n if isinstance(etype, str) else list(etype)
    return pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "mention_id": pa.array(range(n), type=pa.int64()),
            "etype": etypes,
            "start": pa.array([0] * n, type=pa.int64()),
            "end": pa.array([1] * n, type=pa.int64()),
            "surface": pa.array(surfaces, type=pa.string()),
        }
    )


def test_exact_then_fold_then_lower(norm):
    # drug entry (drug sieve = exact -> tmchem fold); i odd so the
    # space variant is NOT an explicit alias and must hit via fold
    i = 9
    assert dicts.ETYPES[i % 7] == "drug"
    aliases = dicts.aliases_of(i)
    base = aliases[0]
    hyph = next(a for a in aliases if "-" in a)
    out = norm(
        _mentions(
            [
                base,  # exact
                base.upper(),  # exact (alias in dict)
                hyph.replace("-", " "),  # tmchem fold collision
            ],
            etype="drug",
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
        _mentions(
            ["hsa-miR-21-5p", "hsa-mir-21-3p", "hsa-miR-21"],
            etype="mirna",
        )
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
    i = 3  # i%3==0 -> has meta; ETYPES[3] == 'species'
    base = dicts.aliases_of(i)[0]
    out = norm(_mentions([base], etype="species")).to_pylist()[0]
    assert f"BERN:{out['oid']}" in out["ids"]
    assert any(x.startswith("MESH:") for x in out["ids"])


def test_per_type_sieve_prevents_cross_type_claim():
    """Reference semantics (normalize.py:309-501): each etype runs its
    own sieve against its own dictionary. A drug-typed surface whose
    lowercase matches a SPECIES alias must stay CUI-less (the drug
    chain has no lowercase step and no species entries), while the
    species-typed mention resolves — the global chain would have
    claimed both."""
    import pyarrow as pa

    from bern_ray.stages.normalize import MentionNormalizer

    tables = {
        "exact": {"species": {"Acme bug": "SP:000001"}},
        "folded": {},
        "lower": {"species": {"acme bug": "SP:000001"}},
        "closure": {},
        "meta": {},
    }
    nz = MentionNormalizer(tables)
    batch = pa.table(
        {
            "surface": pa.array(["ACME BUG", "ACME BUG"]),
            "etype": pa.array(["drug", "species"]),
        }
    )
    out = nz(batch)
    oids = out["oid"].to_pylist()
    ids = out["ids"].to_pylist()
    assert oids[0] is None and ids[0] == ["CUI-less"]  # drug: not claimed
    assert oids[1] == "SP:000001"  # species: lowercase sieve resolves
