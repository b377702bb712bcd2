"""Extract stage: html -> byte-identical text + candidate entity mentions.

The Ray-native analog of the reference's ingest + NER front half
(SURVEY.md §7.0): deterministic text extraction replaces the XML
flattening (download.py:179-424), and a gazetteer + pattern taggers
replace BioBERT span proposal. Runs as a STATEFUL ACTOR POOL —
compiled alternation regexes and dictionaries are built once per actor
in ``__init__`` (the reference loads its dictionaries once per server
process, normalize.py:16-166), and each ``__call__`` processes one
Arrow batch.

Output schema (flat mentions table; explicit mention_id replaces the
reference's positional identity, SURVEY.md §2.4):
    url:string, mention_id:int64, etype:string,
    start:int64, end:int64 (exclusive), surface:string

Semantics reproduced from the reference:
- stoplist filter: species surfaces in the human-synonym stoplist are
  dropped (utils.py:269-308).
- span-conflict resolution: every candidate span carries a SCORE (the
  analog of the reference's mean softmax over the span's logit
  window, biobert_ner/ops.py:214-230); overlapping spans duel on
  score first — a shorter higher-scored span beats a longer
  lower-scored one, exactly as merge_results keeps the
  higher-mean-probability type (ops.py:232-476) — with span length
  then etype rank as deterministic tie-breaks. Dictionary surfaces
  share one confidence (DICT_CONF) so the synthetic corpus resolves
  identically to a pure length duel; tests inject per-surface
  confidences to pin the score-first semantics.
- surface invariant: surface == text[start:end] always
  (convert.py:453); spans use the EXCLUSIVE-end convention, fixing the
  reference's inclusive/exclusive split (ops.py:55-58 vs
  normalize.py:206) once.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

from ..core.fold import SPECIES_STOPLIST, fold_text
from ..sources import dicts

# etype priority for the span-conflict duel (higher wins ties of equal
# span length) — mirrors the pairwise type preferences in
# biobert_ner/ops.py:232-476.
_ETYPE_RANK = {
    "mutation": 7, "gene": 6, "disease": 5, "drug": 4,
    "species": 3, "mirna": 2, "pathway": 1,
}

# span-confidence analogs of the reference's mean softmax probability
# (ops.py:214-230): dictionary hits are high-confidence, pattern-rule
# hits slightly lower (the reference's tmTool mutations similarly
# outrank model spans only via the type table, ops.py:259-267)
DICT_CONF = 0.9
PATTERN_CONF = 0.8

_MIRNA_RE = re.compile(
    r"\b(hsa|mmu|rno)-(mir|miR|let)-(\d+)([a-z]?)(-[35]p)?\b"
)

_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_from_html(html_bytes: bytes) -> str:
    """Deterministic html -> folded text (the byte-identical invariant)."""
    s = html_bytes.decode("utf-8")
    m = re.search(r"<body>(.*)</body>", s, re.DOTALL)
    body = m.group(1) if m else s
    stripped = _TAG_RE.sub("", body)
    raw = _html.unescape(stripped)
    return fold_text(pa.array([raw])).to_pylist()[0]


def extract_texts(html_col) -> pa.Array:
    """Vectorized variant over an Arrow binary array."""
    decoded = [b.decode("utf-8") for b in html_col.to_pylist()]
    bodies = []
    for s in decoded:
        m = re.search(r"<body>(.*)</body>", s, re.DOTALL)
        body = m.group(1) if m else s
        bodies.append(_html.unescape(_TAG_RE.sub("", body)))
    return fold_text(pa.array(bodies, type=pa.string()))


def _fnv64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def mention_id_of(url: str, start: int) -> int:
    """Stable per-(url, start) 63-bit id (FIXTURES.md §4)."""
    return _fnv64(f"{url}#{start}") >> 1


def normalize_mirna(prefix: str, mid: str, num: str, letter: str) -> str:
    """Rule-based miRNA normalization: case-fold 'miR', drop -3p/-5p arm
    (reference rule set: normalizers/miRNA_normalizer.py:60-151)."""
    stem = "let" if mid.lower() == "let" else "mir"
    return f"MI:{prefix}-{stem}-{num}{letter}"


def trie_regex(words) -> str:
    """Compile a word list into a prefix-shared (trie) regex body.

    A flat 2,000-branch alternation costs O(text x alternatives) in
    CPython's backtracking engine; sharing prefixes turns the scan
    into an Aho-Corasick-like automaton walk inside the C regex
    engine (~one state transition per char). Longest-match semantics
    are preserved by emitting child continuations BEFORE the
    empty (word-end) alternative at every node, so the engine only
    falls back to a shorter accept when the longer path (or its
    boundary lookahead) fails — exactly the leftmost-longest duel the
    flat longest-first alternation implemented.
    """
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}
    def emit(node: dict) -> str:
        alts = []
        has_end = False
        for ch in sorted(k for k in node if k):
            alts.append(re.escape(ch) + emit(node[ch]))
        has_end = "" in node
        if not alts:
            return ""
        body = "|".join(alts)
        if has_end:
            return f"(?:{body}|)"
        if len(alts) == 1:
            return body
        return f"(?:{body})"
    return emit(trie)


class MentionExtractor:
    """Actor-pool callable: pages batch -> mentions batch.

    State built once per actor: the gazetteer TRIE regex over all
    dictionary surfaces (prefix-shared alternation — leftmost-longest
    alias wins, see trie_regex) plus the stoplist words tagged as
    species (so the stoplist filter has real work to do, as in the
    reference where the NER model emits them and filter_entities
    drops them).
    """

    def __init__(
        self,
        extract_from_html: bool = False,
        surface_conf: dict[str, float] | None = None,
        sentence_mode: bool = False,
    ):
        t = dicts.build_mention_dict()
        surfaces = t["surface"].to_pylist()
        oids = t["oid"].to_pylist()
        etypes = t["etype"].to_pylist()
        self.surface_etype = dict(zip(surfaces, etypes))
        self.surface_oid = dict(zip(surfaces, oids))
        # per-surface confidence overrides (tests; a model-scored
        # deployment would populate this from calibration data)
        self.surface_conf = surface_conf or {}
        # stoplist words are taggable species surfaces that must then
        # be filtered — reference behavior (utils.py:279-308)
        for w in SPECIES_STOPLIST:
            self.surface_etype.setdefault(w, "species")
        self.gazetteer = re.compile(
            r"(?<![0-9A-Za-z])("
            + trie_regex(self.surface_etype)
            + r")(?![0-9A-Za-z])"
        )
        # nested candidates: for each surface, the shorter dictionary
        # surfaces that are boundary-valid prefixes of it. The scan
        # finds the leftmost-LONGEST match; these rivals re-enter the
        # duel so a higher-scored shorter span can win (ops.py:232-476
        # keeps the higher-scored type, not the longer span).
        all_surf = set(self.surface_etype)
        self.nested: dict[str, list[str]] = {}
        for s in all_surf:
            subs = [
                s[:j]
                for j in range(1, len(s))
                if not s[j].isalnum() and s[:j] in all_surf
            ]
            if subs:
                self.nested[s] = subs
        self.extract_from_html = extract_from_html
        # sentence mode (M5-M7 pipeline parity): the document is split
        # into sentence units (core/tokenize.py sentence_split) and
        # each unit is scanned independently — the shape a windowed
        # model scorer needs (the reference scores sentence units,
        # run_ner.py; title kept WHOLE, ops.py:8-34). Spans are
        # offset back to document coordinates, so output is identical
        # to whole-text scanning whenever no dictionary surface
        # crosses a sentence boundary (pytest-pinned).
        self.sentence_mode = sentence_mode

    def _units(self, text: str) -> list[tuple[int, str]]:
        """(doc_offset, segment) sentence units; first line (title
        analog) is never split — the reference's title-kept-whole rule
        (ops.py:8-34)."""
        from ..core.tokenize import sentence_split

        nl = text.find("\n")
        if nl < 0:
            title, rest, roff = text, "", 0
        else:
            title, rest, roff = text[: nl + 1], text[nl + 1 :], nl + 1
        units = [(0, title)] if title else []
        units.extend((roff + s, rest[s:e]) for s, e in sentence_split(rest))
        return units

    def _scan(self, url: str, text: str, off: int = 0):
        rows = []
        for m in self.gazetteer.finditer(text):
            cands = [m.group(1)] + self.nested.get(m.group(1), [])
            for surf in cands:
                et = self.surface_etype[surf]
                if et == "species" and surf in SPECIES_STOPLIST:
                    continue  # stoplist filter (M11)
                sc = self.surface_conf.get(surf, DICT_CONF)
                s = off + m.start(1)
                rows.append((url, s, s + len(surf), surf, et, sc))
        for m in _MIRNA_RE.finditer(text):
            surf = m.group(0)
            sc = self.surface_conf.get(surf, PATTERN_CONF)
            rows.append((url, off + m.start(), off + m.end(), surf, "mirna", sc))
        return rows

    def _tag_one(self, url: str, text: str):
        if self.sentence_mode:
            rows = []
            for off, seg in self._units(text):
                rows.extend(self._scan(url, seg, off))
        else:
            rows = self._scan(url, text)
        if not rows:
            return rows
        # span-conflict duel (ops.py:232-476 analog): score desc, then
        # length desc, then etype rank desc; greedily keep
        # non-overlapping spans
        rows.sort(
            key=lambda r: (
                -r[5],
                -(r[2] - r[1]),
                -_ETYPE_RANK.get(r[4], 0),
                r[1],
            )
        )
        kept = []
        occupied: list[tuple[int, int]] = []
        for r in rows:
            if any(not (r[2] <= s or r[1] >= e) for s, e in occupied):
                continue
            occupied.append((r[1], r[2]))
            kept.append(r)
        kept.sort(key=lambda r: r[1])
        return kept

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.extract_from_html:
            texts = extract_texts(batch["html"]).to_pylist()
        else:
            texts = batch["text"].to_pylist()
        urls = batch["url"].to_pylist()
        out_url, out_mid, out_et = [], [], []
        out_s, out_e, out_surf, out_sc = [], [], [], []
        for url, text in zip(urls, texts):
            for (u, s, e, surf, et, sc) in self._tag_one(url, text):
                assert text[s:e] == surf  # invariant convert.py:453
                out_url.append(u)
                out_mid.append(mention_id_of(u, s))
                out_et.append(et)
                out_s.append(s)
                out_e.append(e)
                out_surf.append(surf)
                out_sc.append(sc)
        return pa.table(
            {
                "url": pa.array(out_url, type=pa.string()),
                "mention_id": pa.array(out_mid, type=pa.int64()),
                "etype": pa.array(out_et, type=pa.string()),
                "start": pa.array(out_s, type=pa.int64()),
                "end": pa.array(out_e, type=pa.int64()),
                "surface": pa.array(out_surf, type=pa.string()),
                "score": pa.array(out_sc, type=pa.float64()),
            }
        )


class TextExtractionChecker:
    """Actor-pool callable verifying the byte-identical invariant:
    re-extracted text from `html` equals the `text` column, per url.
    Emits (url, ok:bool) — consumed by tests and the entry smoke."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ex = extract_texts(batch["html"])
        ok = pa.compute.equal(ex, batch["text"])
        return pa.table({"url": batch["url"], "ok": ok})
