"""BioC XML ingest (SURVEY.md §2.1 S3 wire format).

Parses the BioC collection XML the reference consumes from the
PubTator API (reference convert.py:201-298
`pubtator_biocxml2dict_list`):

    <collection>
      <document>
        <id>{pmid}</id>
        <passage>
          <infon key="type">title|abstract</infon>
          <text>...</text>
          <annotation>
            <infon key="type">{etype}</infon>
            <infon>...identifier...</infon>
            <location offset="N" length="M"/>
            <text>{mention}</text>
          </annotation>
        </passage>
      </document>
    </collection>

Reproduced semantics (reference line cites):

- passage ``infon key='type'`` selects title vs abstract text
  (convert.py:235-241);
- annotations keep only the mutation types by default
  (convert.py:210, 243-245; pass ``type_filter=None`` to keep all);
- the FIRST infon carries the normalized identifier
  (convert.py:249 ``findall('infon')[0]``) — emitted as ``ids``;
- mention text and title/abstract run through the canonical unicode
  fold (convert.py:248/259-260 ``preprocess``);
- mentions sort by start (convert.py:257-258);
- spans are re-located against the fused ``title + ' ' + abstract``
  via n-th-occurrence recovery (convert.py:264-267
  ``get_bestplus_spans``; our exclusive-end `recover_spans`), with
  unlocatable mentions DROPPED like the reference's 'No text' rows;
- the requested-id left join with empty-doc fill (convert.py:281-297)
  is the engine-level join covered by `requested_docs`
  (pipelines/relational.py; stages/join.py bucket_join how='left') —
  compose it downstream of this parser.

Output schema matches sources/pubtator.py's document table
(url/title/abstract/n_mentions/mentions/error), so every downstream
stage (explode_mentions, writers, linkage) consumes BioC input
unchanged. Parse errors become rows with a non-null ``error`` and no
mentions — a pipeline keeps going where the reference's HTTP handler
drops the request.

Scale shape: each input row is one self-contained XML chunk (a file
or an API response); chunks parallelize across `map_batches` tasks
with no cross-batch state — the batch axis is the parallelism, same
as the PubTator parser.
"""

from __future__ import annotations

import xml.etree.ElementTree as ElTree

import pyarrow as pa

import ray.data

from ..core.fold import fold_text_str
from .pubtator import _MENTION_TYPE, MUTATION_TYPES, recover_spans


def _infon(el: "ElTree.Element", key: str) -> str | None:
    """DIRECT-child infon lookup. A descendant search (`.//*`) would
    let an annotation's type infon masquerade as the passage type when
    the passage's own infon is missing or serialized after the
    annotations — silently misrouting title/abstract text."""
    for infon in el.findall("infon"):
        if infon.get("key") == key:
            return infon.text
    return None


def _parse_document(doc: "ElTree.Element", type_filter) -> dict:
    id_el = doc.find("id")
    url = (id_el.text or "") if id_el is not None else ""
    # passages kept in document order; title = the 'title' passage,
    # abstract = every other TYPED passage joined in offset order (the
    # reference's shape is exactly title+abstract, convert.py:235-241;
    # real-world BioC carries N 'paragraph'/'section' passages, which
    # fuse into the same content stream here)
    title_text = ""
    body_parts: list[str] = []
    raw_mentions: list[dict] = []
    error: str | None = None
    for p_idx, passage in enumerate(doc.iter("passage")):
        ptype = _infon(passage, "type")
        if ptype is None:
            # missing passage-type infon: flag the row rather than
            # silently dropping (or misrouting) its text
            error = "BioC passage missing direct infon key='type'"
        for child in passage:
            if child.tag == "text":
                if ptype == "title":
                    title_text = child.text or ""
                elif ptype is not None:
                    body_parts.append(child.text or "")
            elif child.tag == "annotation":
                etype = _infon(child, "type") or ""
                if type_filter is not None and etype not in type_filter:
                    continue
                loc = child.find("location")
                text_el = child.find("text")
                if loc is None or text_el is None:
                    continue
                try:
                    loc_offset = int(loc.get("offset", "0"))
                except ValueError:
                    loc_offset = 0
                infons = child.findall("infon")
                ident = infons[0].text if infons else None
                raw_mentions.append(
                    {
                        "surface": fold_text_str(text_el.text or ""),
                        "etype": etype,
                        "ids": [ident] if ident else [],
                        # sort key monotone under BOTH BioC offset
                        # conventions (document-global and
                        # passage-local): annotations never cross
                        # passage boundaries, so (passage, offset)
                        # orders identically to the global offset
                        "_order": (p_idx, loc_offset),
                    }
                )
    title = fold_text_str(title_text)
    abstract = fold_text_str(" ".join(p for p in body_parts if p))
    content = title + " " + abstract if abstract else title
    # the reference SORTS mentions by start before span recovery
    # (convert.py:257-265 get_bestplus_spans): n-th-occurrence
    # assignment is order-sensitive, so out-of-offset-order
    # annotation serialization must not swap repeated surfaces
    raw_mentions.sort(key=lambda m: m["_order"])
    # n-th-occurrence relocation against the fused text; unlocatable
    # mentions drop (reference's get_bestplus_spans 'No text' rows)
    spans = recover_spans([m["surface"] for m in raw_mentions], content)
    mentions = [
        {
            "surface": m["surface"],
            "etype": m["etype"],
            "ids": m["ids"],
            "start": s,
            "end": e,
        }
        for m, (s, e) in zip(raw_mentions, spans)
        if s >= 0
    ]
    mentions.sort(key=lambda m: m["start"])
    return {
        "url": url,
        "title": title,
        "abstract": abstract,
        "mentions": mentions,
        "error": error,
    }


def parse_bioc_chunk(
    t: pa.Table,
    chunk_col: str = "xml",
    type_filter: tuple[str, ...] | None = MUTATION_TYPES,
) -> pa.Table:
    rows = []
    for chunk in t[chunk_col].to_pylist():
        if not chunk:
            continue
        try:
            # chunk may be str or raw bytes (binary column); malformed
            # XML or undecodable bytes become error rows, not crashes
            root = ElTree.fromstring(chunk)
        except (ElTree.ParseError, ValueError, UnicodeDecodeError) as pe:
            rows.append(
                {
                    "url": "",
                    "title": "",
                    "abstract": "",
                    "mentions": [],
                    "error": f"XML ParseError: {pe}",
                }
            )
            continue
        docs = (
            [root]
            if root.tag == "document"
            else root.findall(".//document")
        )
        for doc in docs:
            rows.append(_parse_document(doc, type_filter))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "title": pa.array(
                [r["title"] for r in rows], type=pa.string()
            ),
            "abstract": pa.array(
                [r["abstract"] for r in rows], type=pa.string()
            ),
            "n_mentions": pa.array(
                [len(r["mentions"]) for r in rows], type=pa.int64()
            ),
            "mentions": pa.array(
                [r["mentions"] for r in rows],
                type=pa.list_(_MENTION_TYPE),
            ),
            "error": pa.array(
                [r["error"] for r in rows], type=pa.string()
            ),
        }
    )


def from_bioc_docs(
    chunks: "ray.data.Dataset",
    chunk_col: str = "xml",
    type_filter: tuple[str, ...] | None = MUTATION_TYPES,
) -> "ray.data.Dataset":
    """Dataset of BioC XML chunks -> document Dataset with the same
    schema as from_pubtator_docs (downstream-interchangeable)."""
    return chunks.map_batches(
        lambda t: parse_bioc_chunk(t, chunk_col, type_filter),
        batch_format="pyarrow",
    )
