"""Normalization stage: mention surface -> canonical oid via ordered
PER-TYPE broadcast-dictionary sieve chains.

Ray-native recast of the reference Normalizer (normalize.py:16-289)
and its per-type dict servers (T4-T9 in SURVEY.md §2.3): every join
here is a MAP-SIDE HASH JOIN against dictionaries broadcast once per
actor — never a shuffle. Mirroring the reference, each entity type
runs its OWN sieve order against its OWN dictionary
(normalize.py:309-501 dispatches each type to a distinct normalizer
process with a distinct fallback chain), so a drug surface can never
be claimed by a gene alias:

  mutation : exact                       (mutation_normalizer.py:44-51)
  drug     : exact -> tmchem fold        (chemical_normalizer.py:64-72)
  species  : exact -> lowercase          (species_normalizer.py:47-52)
  gene     : exact -> fold -> lowercase -> ' gene' strip
                                         (normalize.py:538-548)
  disease  : exact -> lowercase -> fold  (sieve order, T5)
  mirna    : exact -> pattern rule       (miRNA_normalizer.py:60-151)
  pathway  : exact -> fold               (T11)
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

# per-type sieve orders (reference normalize.py:309-501; see module
# docstring). Types not listed fall back to the full chain.
SIEVE_CHAINS: dict[str, tuple[str, ...]] = {
    "mutation": ("exact",),
    "drug": ("exact", "fold"),
    "species": ("exact", "lower"),
    "gene": ("exact", "fold", "lower", "gene_strip"),
    "disease": ("exact", "lower", "fold"),
    "mirna": ("exact", "mirna_rule"),
    "pathway": ("exact", "fold"),
}
DEFAULT_CHAIN: tuple[str, ...] = (
    "exact",
    "fold",
    "lower",
    "gene_strip",
    "mirna_rule",
)


def build_lookup_tables() -> dict:
    """Driver-side: build all broadcast lookup dicts once — keyed
    PER ENTITY TYPE (each reference normalizer owns its dictionary)."""
    t = dicts.build_mention_dict()
    surfaces = t["surface"].to_pylist()
    oids = t["oid"].to_pylist()
    etypes = t["etype"].to_pylist()
    exact: dict[str, dict] = {}
    folded: dict[str, dict] = {}
    lower: dict[str, dict] = {}
    fold_keys = tmchem_key(pa.array(surfaces, type=pa.string())).to_pylist()
    for s, o, e, fk in zip(surfaces, oids, etypes, fold_keys):
        exact.setdefault(e, {})[s] = o
        folded.setdefault(e, {}).setdefault(fk, o)
        lower.setdefault(e, {}).setdefault(s.lower(), o)
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
        # union maps for the default chain (unknown etypes): first
        # type wins ties, matching the old global-chain behavior
        def _union(per_type: dict) -> dict:
            out: dict = {}
            for d in per_type.values():
                for k, v in d.items():
                    out.setdefault(k, v)
            return out

        self.exact_all = _union(self.exact)
        self.folded_all = _union(self.folded)
        self.lower_all = _union(self.lower)

    def _run_chain(
        self, sp: pd.Series, chain: tuple[str, ...], etype: str | None
    ) -> pd.Series:
        """Apply one sieve chain to the surfaces of a single etype —
        each step only fills remaining misses."""
        if etype is None:
            exact, folded, lower = (
                self.exact_all,
                self.folded_all,
                self.lower_all,
            )
        else:
            exact = self.exact.get(etype, {})
            folded = self.folded.get(etype, {})
            lower = self.lower.get(etype, {})
        oid = pd.Series([None] * len(sp), index=sp.index, dtype=object)
        for step in chain:
            miss = oid.isna()
            if not miss.any():
                break
            sub = sp[miss]
            if step == "exact":
                oid.loc[miss] = sub.map(exact)
            elif step == "fold":
                fk = pd.Series(
                    tmchem_key(
                        pa.array(sub.tolist(), type=pa.string())
                    ).to_pylist(),
                    index=sub.index,
                )
                oid.loc[miss] = fk.map(folded)
            elif step == "lower":
                oid.loc[miss] = sub.str.lower().map(lower)
            elif step == "gene_strip":
                stripped = sub.str.replace(r"(?i) gene$", "", regex=True)
                fk = pd.Series(
                    tmchem_key(
                        pa.array(stripped.tolist(), type=pa.string())
                    ).to_pylist(),
                    index=stripped.index,
                )
                oid.loc[miss] = fk.map(folded)
            elif step == "mirna_rule":

                def _mir(s: str):
                    m = _MIRNA_RE.fullmatch(s)
                    if m:
                        return normalize_mirna(
                            m.group(1), m.group(2), m.group(3), m.group(4)
                        )
                    return None

                oid.loc[miss] = sub.map(_mir)
        return oid

    def __call__(self, batch: pa.Table) -> pa.Table:
        sp = batch["surface"].to_pandas()
        et = batch["etype"].to_pandas()
        oid = pd.Series([None] * len(sp), index=sp.index, dtype=object)
        for etype in et.unique():
            idx = et.index[et == etype]
            chain = SIEVE_CHAINS.get(etype)
            if chain is None:
                oid.loc[idx] = self._run_chain(
                    sp.loc[idx], DEFAULT_CHAIN, None
                )
            else:
                oid.loc[idx] = self._run_chain(sp.loc[idx], chain, etype)
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
