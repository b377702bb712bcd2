"""Normalization stage: mention surface -> canonical oid via ordered
broadcast-dictionary fallback chain.

Ray-native recast of the reference Normalizer (normalize.py:16-289)
and its per-type dict servers (T4-T9 in SURVEY.md §2.3): every join
here is a MAP-SIDE HASH JOIN against dictionaries broadcast once per
actor — never a shuffle. The ordered fallback chain reproduces the
reference's semantics (normalize.py:584-603):

  1. exact surface            (mutation_normalizer.py:44-51)
  2. tmchem fold              (chemical_normalizer.py:64-72)
  3. lowercase                (species_normalizer.py:47-52)
  4. ' gene' suffix strip + fold  (normalize.py:538-548)
  5. pattern rule (miRNA)     (normalizers/miRNA_normalizer.py:60-151)
  miss -> null oid, ids=['CUI-less'] (normalize.py:166)

After the chain, oids pass through the `oid_merge` transitive closure
(goid2goid analog, normalize.py:89-95) and external IDs are attached
from `meta` (gid2meta/did2meta/cid2meta analog, normalize.py:97-150).

The dictionaries are tiny side inputs: the pipeline `ray.put`s the
prebuilt lookup tables once and each actor `ray.get`s them in
``__init__`` (zero-copy shared memory on a node) — the broadcast
pattern that replaces the reference's per-process dict loads.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ..core.fold import tmchem_key
from ..sources import dicts
from .extract import _MIRNA_RE, normalize_mirna


def build_lookup_tables() -> dict:
    """Driver-side: build all broadcast lookup dicts once."""
    t = dicts.build_mention_dict()
    surfaces = t["surface"].to_pylist()
    oids = t["oid"].to_pylist()
    exact = dict(zip(surfaces, oids))
    folded = {}
    for s, o in zip(surfaces, oids):
        folded.setdefault(
            tmchem_key(pa.array([s])).to_pylist()[0], o
        )
    lower = {}
    for s, o in zip(surfaces, oids):
        lower.setdefault(s.lower(), o)
    closure = dicts.merge_closure(dicts.build_oid_merge())
    meta_t = dicts.build_meta()
    meta = dict(
        zip(meta_t["oid"].to_pylist(), meta_t["ext_ids"].to_pylist())
    )
    return {
        "exact": exact,
        "folded": folded,
        "lower": lower,
        "closure": closure,
        "meta": meta,
    }


class MentionNormalizer:
    """Actor-pool callable: mentions batch -> batch + oid/ids columns.

    ``tables_ref`` is a ``ray.ObjectRef`` from ``ray.put`` (broadcast);
    passing the dict directly also works for tests without Ray.
    """

    def __init__(self, tables_ref=None):
        if tables_ref is None:
            tables = build_lookup_tables()
        else:
            try:
                import ray

                tables = (
                    ray.get(tables_ref)
                    if isinstance(tables_ref, ray.ObjectRef)
                    else tables_ref
                )
            except ImportError:  # pragma: no cover
                tables = tables_ref
        self.exact = tables["exact"]
        self.folded = tables["folded"]
        self.lower = tables["lower"]
        self.closure = tables["closure"]
        self.meta = tables["meta"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        surf = batch["surface"]
        sp = surf.to_pandas()
        # ordered fallback chain — each step only fills remaining misses
        oid = sp.map(self.exact)
        miss = oid.isna()
        if miss.any():
            fk = pd.Series(
                tmchem_key(pa.array(sp[miss].tolist(), type=pa.string())).to_pylist(),
                index=sp.index[miss],
            )
            oid.loc[miss] = fk.map(self.folded)
            miss = oid.isna()
        if miss.any():
            oid.loc[miss] = sp[miss].str.lower().map(self.lower)
            miss = oid.isna()
        if miss.any():
            stripped = sp[miss].str.replace(
                r"(?i) gene$", "", regex=True
            )
            fk = pd.Series(
                tmchem_key(
                    pa.array(stripped.tolist(), type=pa.string())
                ).to_pylist(),
                index=stripped.index,
            )
            oid.loc[miss] = fk.map(self.folded)
            miss = oid.isna()
        if miss.any():
            # pattern rule for miRNA surfaces
            def _mir(s: str):
                m = _MIRNA_RE.fullmatch(s)
                if m:
                    return normalize_mirna(
                        m.group(1), m.group(2), m.group(3), m.group(4)
                    )
                return None

            oid.loc[miss] = sp[miss].map(_mir)
        # canonical merge (goid2goid closure)
        merged = oid.map(self.closure)
        oid = merged.where(merged.notna(), oid)
        ext = oid.map(self.meta)
        ids = [
            (list(e) if isinstance(e, list) else [])
            + ([f"BERN:{o}"] if isinstance(o, str) else ["CUI-less"])
            for o, e in zip(oid.tolist(), ext.tolist())
        ]
        return batch.append_column(
            "oid", pa.array([o if isinstance(o, str) else None for o in oid], type=pa.string())
        ).append_column(
            "ids", pa.array(ids, type=pa.list_(pa.string()))
        ).append_column(
            "fold_key", tmchem_key(batch["surface"])
        )
