"""Deterministic synthetic normalization dictionaries (side inputs).

Mirrors the reference's dictionary resources re-expressed as small
Arrow tables (FIXTURES.md §2):

- `mention_dict`  (oid, surface, etype): the alias dictionaries loaded
  by the per-type normalizers (reference: normalize.py:72-95,
  normalizers/chemical_normalizer.py:32-40,
  normalizers/species_normalizer.py:30-39).
- `oid_merge`     (src_oid, dst_oid): canonical-merge edges analogous
  to goid2goid (reference: normalize.py:89-95) — chains of length 3
  force transitive closure through connected components.
- `meta`          (oid, ext_ids): external-ID attach maps analogous to
  gid2meta/did2meta/cid2meta (reference: normalize.py:97-150).

Everything is a pure function of (index, seed) — no RNG state ordering
dependence, so any scale / partitioning reproduces the same dicts.
Alias syllables are disjoint from the testdata `documents` vocabulary,
so gazetteer hits in synthesized pages are exactly the planted ones.
"""

from __future__ import annotations

import pyarrow as pa

ETYPES = ["gene", "disease", "drug", "species", "mutation", "mirna", "pathway"]
_PREFIX = {
    "gene": "GN",
    "disease": "DI",
    "drug": "CH",
    "species": "SP",
    "mutation": "MU",
    "mirna": "MI",
    "pathway": "PW",
}
_SYLL = [
    "zor", "vax", "qin", "lum", "tek", "rya", "bex", "nid", "kol", "fam",
    "gru", "pyx", "wex", "juv", "hax", "cyn", "dov", "yel", "mab", "sil",
]
_TYPE_SUFFIX = {
    "gene": " receptor",
    "disease": " syndrome",
    "drug": "inib",
    "species": " bacterium",
    "mutation": "ins",
    "mirna": "",
    "pathway": " pathway",
}

N_OIDS = 420  # fixed dictionary size; aliases per oid vary 3-6


def _base_name(i: int) -> str:
    s = _SYLL
    return s[i % 20] + s[(i * 7 + 3) % 20] + s[(i * 13 + 5) % 20] + str(i % 97)


def oid_of(i: int) -> str:
    return f"{_PREFIX[ETYPES[i % 7]]}:{i:06d}"


def aliases_of(i: int) -> list[str]:
    """Deterministic alias variants for dictionary entry i.

    Variants collide under the reference folds: case variants collapse
    under the lowercase fallback (species_normalizer.py:47-52), and
    hyphen/space variants collapse under the tmchem fold
    (chemical_normalizer.py:64-72). The ' gene'-suffixed alias
    exercises the suffix strip (normalize.py:538-548).
    """
    etype = ETYPES[i % 7]
    base = _base_name(i)
    name = base + _TYPE_SUFFIX[etype]
    out = [name, name.upper(), name.capitalize()]
    # hyphen/space punctuation variants (same tmchem key)
    head, tail = base[:3], base[3:]
    out.append(f"{head}-{tail}{_TYPE_SUFFIX[etype]}")
    if i % 2 == 0:
        out.append(f"{head} {tail}{_TYPE_SUFFIX[etype]}")
    if etype == "gene" and i % 3 == 0:
        out.append(name + " gene")
    # a structurally different alias mapped by the dictionary only
    # (the trailing -{i} keeps surfaces globally unique, matching the
    # reference's unique-mention dictionary invariant,
    # gene_auxiliary_normalizer.py:42)
    if i % 4 == 1:
        out.append(f"{_SYLL[(i + 1) % 20]}{_SYLL[(i * 3 + 2) % 20]}-{i}")
    # dedupe, preserve order
    seen, uniq = set(), []
    for a in out:
        if a not in seen:
            seen.add(a)
            uniq.append(a)
    return uniq


def build_mention_dict() -> pa.Table:
    oids, surfaces, etypes = [], [], []
    for i in range(N_OIDS):
        oid = oid_of(i)
        et = ETYPES[i % 7]
        for a in aliases_of(i):
            oids.append(oid)
            surfaces.append(a)
            etypes.append(et)
    return pa.table({"oid": oids, "surface": surfaces, "etype": etypes})


def build_oid_merge() -> pa.Table:
    """src->dst merge edges; i%21 in {7,14} merges i into i-7.

    Chains 14 -> 7 -> 0 (mod 21, same etype since the step is 7) force
    the connected-components stage to do transitive closure, exactly
    like chained goid2goid entries would.
    """
    src, dst = [], []
    for i in range(N_OIDS):
        if i % 21 in (7, 14):
            src.append(oid_of(i))
            dst.append(oid_of(i - 7))
    return pa.table({"src_oid": src, "dst_oid": dst})


def build_meta() -> pa.Table:
    oids, ext = [], []
    for i in range(N_OIDS):
        if i % 3 != 2:
            oids.append(oid_of(i))
            ext.append([f"MESH:D{i:05d}", f"EXT:{i * 3}"])
    return pa.table(
        {"oid": oids, "ext_ids": pa.array(ext, type=pa.list_(pa.string()))}
    )


def merge_closure(merge_tbl: pa.Table) -> dict[str, str]:
    """Resolve src->dst edges to their transitive root (path compressed).

    The reference applies goid2goid as a single-hop map
    (normalize.py:591-592); our chains are deeper, so we compute the
    full closure once — the driver-side analog of the distributed
    connected-components stage for this small side input.
    """
    parent = dict(
        zip(merge_tbl["src_oid"].to_pylist(), merge_tbl["dst_oid"].to_pylist())
    )

    def find(x: str) -> str:
        path = []
        while x in parent:
            path.append(x)
            x = parent[x]
        for p in path:
            parent[p] = x
        return x

    return {s: find(s) for s in list(parent)}


def surface_to_oid() -> dict[str, str]:
    """Exact-surface lookup dict (first key of the fallback chain)."""
    t = build_mention_dict()
    return dict(zip(t["surface"].to_pylist(), t["oid"].to_pylist()))


def canonical_oid(i: int, closure: dict[str, str] | None = None) -> str:
    """Ground-truth canonical oid of dictionary entry i (tests only)."""
    if closure is None:
        closure = merge_closure(build_oid_merge())
    o = oid_of(i)
    return closure.get(o, o)
