"""Full PubTator DOCUMENT format + sibling converters (SURVEY.md §2.1
S1/S2/S4/S6/S7).

The reference's canonical interchange format is the three-part
PubTator document block (reference: convert.py:9-100
`pubtator2dict_list`, convert.py:103-198 `pubtatorstr2dict_list`):

    {id}|t|{title}
    {id}|a|{abstract}
    {id}\\t{start}\\t{end}\\t{surface}\\t{type}\\t{ids '|'-joined}
    ...
    <blank line>

with the sentinels ``- No text -`` (title or abstract) and
``-NoAbstract-`` (abstract only) folding to empty strings, a
title-id / abstract-id agreement check, and malformed lines rejected
by column count. Spans index into ``title + ' ' + abstract`` — the
same fused coordinate space our fold/extract stages use — so parsed
mentions drop straight into the linkage pipeline.

Scale shape:

- WRITER (`to_pubtator_docs`): docs and mentions are tagged, unioned
  and routed through ONE `bucketed_apply` shuffle on hash(url) — the
  same single-wide-shuffle shape as `to_denotations`; inside a bucket
  the kernel lexsorts (url, start) and emits one formatted block per
  document. No per-doc `map_groups`, no driver materialization.
- PARSER (`from_pubtator_docs`): each input row is a CHUNK of one or
  more blank-line-separated blocks (a whole small file, or a split at
  block boundaries); blocks are self-contained, so chunks parallelize
  across blocks/files with no cross-batch state. Line parsing is
  per-block Python by nature of the format (the reference's loop,
  convert.py:58-98) — the batch axis, not the line axis, is the
  parallelism.

Sibling converters:

- `pubtator_to_pubannotation` (S6, reference convert.py:351-425):
  PubTator blocks -> PubAnnotation rows (project/sourcedb/sourceid/
  text/denotations). NOTE the reference's own entity filter at
  convert.py:416 (``if entity_cols[4] in entity_cols``) is a tautology
  — every row passes — so no filter is applied here either.
- `tmtool_json_to_mentions` (S7, reference convert.py:589-614
  `tmtooljson2bern`): tmTool JSON -> doc/mention rows with the span
  end+1 fixup (tmTool ends are inclusive; ours are exclusive) and the
  ``Mutation:`` prefix strip on the normalized name.
- `recover_spans` (reference convert.py:428-464 `get_bestplus_spans`):
  re-locate the n-th occurrence of each mention surface in the fused
  text when upstream spans are unreliable (raw-text mode), skipping
  'No text' mentions, counting occurrences per surface in arrival
  order.

All spans in OUR tables are exclusive-end; the reference's inclusive
ends (convert.py:452 ``end = start + len - 1``) are converted at the
boundary in both directions.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.bucketed import PREP_BATCH, bucketed_apply, segments

MUTATION_TYPES = ("ProteinMutation", "DNAMutation", "SNP")
NO_TEXT = "- No text -"
NO_ABSTRACT = "-NoAbstract-"

_MENTION_TYPE = pa.struct(
    [
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("surface", pa.string()),
        ("etype", pa.string()),
        ("ids", pa.list_(pa.string())),
    ]
)

_DOC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("abstract", pa.string()),
        ("n_mentions", pa.int64()),
        ("mentions", pa.list_(_MENTION_TYPE)),
        ("error", pa.string()),
    ]
)


def split_title(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive (title, abstract) from fused text, vectorized.

    The fold stage (core/fold.py) collapses newlines, so the
    title-kept-whole boundary (reference ops.py:8-34: first segment is
    never split) is the first sentence break ``. ``: title = text up
    to and including the '.', abstract = the rest — and the fused
    coordinate space ``title + ' ' + abstract`` reproduces ``text``
    byte-for-byte, so existing mention spans remain valid. Documents
    with no break become title-only with an empty abstract.
    """
    s = t[text_col].to_pandas().astype(str)
    # vectorized three-way split on the FIRST '. ' (pyarrow's slice
    # kernels take scalar bounds only, so pandas does the ragged cut)
    parts = s.str.partition(". ")
    has = parts[1] != ""
    title = (parts[0] + ".").where(has, s)
    abstract = parts[2].where(has, "")
    out = t.append_column("title", pa.array(title, type=pa.string()))
    return out.append_column(
        "abstract", pa.array(abstract, type=pa.string())
    )


# ---------------------------------------------------------------- writer


def _format_docs_bucket(t: pa.Table) -> pa.Table:
    """One url-hash bucket of unioned doc-header (+) mention rows ->
    one PubTator block per document (column ``block``).

    Vectorized: one lexsort, one pandas str-concat for every mention
    line in the bucket, then per-document joins over precomputed
    segment offsets (the only per-doc Python is ''.join of slices).
    """
    if t.num_rows == 0:
        return pa.table({"url": pa.array([], type=pa.string()),
                         "block": pa.array([], type=pa.string())})
    df = t.to_pandas()
    # doc-header rows carry start = -1 so they lexsort first in-doc
    df = df.sort_values(["url", "start"], kind="mergesort")
    url = df["url"].to_numpy(dtype=object)
    seg_starts, sizes = segments(url)
    start = df["start"].to_numpy()
    is_hdr = start < 0

    # np.where evaluates BOTH branches: null-fill before the concat
    title = df["title"].fillna("").to_numpy(dtype=object)
    abstract = df["abstract"].fillna("").to_numpy(dtype=object)
    header = np.where(
        is_hdr, url + "|t|" + title + "\n" + url + "|a|" + abstract, ""
    )

    ids_joined = np.array(
        ["|".join(x) if x is not None else "" for x in df["ids"]],
        dtype=object,
    )
    mline = np.where(
        is_hdr,
        "",
        url
        + "\t"
        + start.astype(str).astype(object)
        + "\t"
        + df["end"].to_numpy().astype(str).astype(object)
        + "\t"
        + df["surface"].fillna("").to_numpy(dtype=object)
        + "\t"
        + df["etype"].fillna("").to_numpy(dtype=object)
        + "\t"
        + ids_joined,
    )
    line = np.where(is_hdr, header, mline)

    blocks = []
    for s, n in zip(seg_starts, sizes):
        seg = line[s : s + n]
        if not seg[0].startswith(url[s] + "|t|"):
            # mentions with no matching doc row: synthesize empty doc
            seg = np.concatenate(
                [[url[s] + "|t|\n" + url[s] + "|a|"], seg]
            )
        blocks.append("\n".join(seg) + "\n")
    return pa.table(
        {
            "url": pa.array(url[seg_starts], type=pa.string()),
            "block": pa.array(blocks, type=pa.string()),
        }
    )


def to_pubtator_docs(
    docs: "ray.data.Dataset",
    mentions: "ray.data.Dataset",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """(docs: url/title/abstract) + (mentions: url/start/end/surface/
    etype/ids) -> one ``(url, block)`` row per document in the full
    PubTator document format (reference convert.py:559-586
    `get_pubtator`). ONE shuffle total."""

    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": t["url"].cast(pa.string()),
                "title": t["title"].cast(pa.string()),
                "abstract": t["abstract"].cast(pa.string()),
                "start": pa.array(np.full(n, -1, dtype=np.int64)),
                "end": pa.array(np.full(n, -1, dtype=np.int64)),
                "surface": pa.nulls(n, pa.string()),
                "etype": pa.nulls(n, pa.string()),
                "ids": pa.nulls(n, pa.list_(pa.string())),
            }
        )

    def tag_mentions(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": t["url"].cast(pa.string()),
                "title": pa.nulls(n, pa.string()),
                "abstract": pa.nulls(n, pa.string()),
                "start": t["start"].cast(pa.int64()),
                "end": t["end"].cast(pa.int64()),
                "surface": t["surface"].cast(pa.string()),
                "etype": t["etype"].cast(pa.string()),
                "ids": t["ids"].cast(pa.list_(pa.string())),
            }
        )

    unioned = docs.map_batches(
        tag_docs, batch_format="pyarrow", batch_size=PREP_BATCH
    ).union(
        mentions.map_batches(
            tag_mentions, batch_format="pyarrow", batch_size=PREP_BATCH
        )
    )
    return bucketed_apply(
        unioned, "url", _format_docs_bucket, num_buckets=num_buckets
    )


# ---------------------------------------------------------------- parser


def _parse_block(block: str, type_filter: tuple[str, ...] | None):
    """One blank-line-delimited PubTator block -> doc dict or error.

    Mirrors reference convert.py:103-198 (`pubtatorstr2dict_list`):
    '|t|' / '|a|' header split with column-count checks, id-agreement
    check, sentinel folding, 6-column mention rows, optional type
    filter (the reference's S2 mutation filter), mentions sorted by
    start. Ends stay exclusive (ours); see module docstring."""
    lines = [ln for ln in block.split("\n") if ln]
    if not lines:
        return None
    err = None
    title_id = abstract_id = ""
    title = abstract = ""
    mentions = []
    for i, line in enumerate(lines):
        if i == 0:
            cols = line.split("|t|")
            if len(cols) != 2:
                return {"url": "", "error": f"wrong #title_cols {len(cols)}"}
            title_id = cols[0]
            title = "" if cols[1] == NO_TEXT else cols[1]
        elif i == 1:
            cols = line.split("|a|")
            if len(cols) != 2:
                return {
                    "url": title_id,
                    "error": f"wrong #abstract_cols {len(cols)}",
                }
            abstract_id = cols[0]
            abstract = (
                "" if cols[1] in (NO_TEXT, NO_ABSTRACT) else cols[1]
            )
            if title_id != abstract_id:
                return {"url": title_id, "error": "pmid disagreement"}
        else:
            cols = line.split("\t")
            if len(cols) != 6:
                return {
                    "url": title_id,
                    "error": f"wrong #mention_cols {len(cols)}",
                }
            if type_filter is not None and cols[4] not in type_filter:
                continue
            mentions.append(
                {
                    "start": int(cols[1]),
                    "end": int(cols[2]),
                    "surface": cols[3],
                    "etype": cols[4],
                    "ids": cols[5].split("|") if cols[5] else [],
                }
            )
    mentions.sort(key=lambda m: m["start"])  # convert.py:31-33
    return {
        "url": title_id,
        "title": title,
        "abstract": abstract,
        "mentions": mentions,
        "error": err,
    }


def parse_pubtator_chunk(
    t: pa.Table,
    chunk_col: str = "block",
    type_filter: tuple[str, ...] | None = None,
) -> pa.Table:
    """Batch of multi-block text chunks -> one row per document.

    Malformed blocks become rows with a non-null ``error`` column and
    empty text/mentions (the reference returns an error JSON and drops
    the whole request, server.py:504-517; a pipeline keeps going)."""
    rows = []
    for chunk in t[chunk_col].to_pylist():
        if chunk is None:
            continue
        for block in chunk.split("\n\n"):
            d = _parse_block(block, type_filter)
            if d is None:
                continue
            rows.append(d)
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "title": pa.array(
                [r.get("title", "") for r in rows], type=pa.string()
            ),
            "abstract": pa.array(
                [r.get("abstract", "") for r in rows], type=pa.string()
            ),
            "n_mentions": pa.array(
                [len(r.get("mentions", [])) for r in rows],
                type=pa.int64(),
            ),
            "mentions": pa.array(
                [r.get("mentions", []) for r in rows],
                type=pa.list_(_MENTION_TYPE),
            ),
            "error": pa.array(
                [r.get("error") for r in rows], type=pa.string()
            ),
        }
    )


def from_pubtator_docs(
    chunks: "ray.data.Dataset",
    chunk_col: str = "block",
    type_filter: tuple[str, ...] | None = None,
) -> "ray.data.Dataset":
    """Dataset of PubTator text chunks -> document Dataset
    (url/title/abstract/mentions/error)."""
    return chunks.map_batches(
        lambda t: parse_pubtator_chunk(t, chunk_col, type_filter),
        batch_format="pyarrow",
    )


def explode_mentions(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Document rows -> flat mentions table (url, start, end, surface,
    etype, ids) — the shape the linkage pipeline consumes."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t["n_mentions"].length() == 0:
            return pa.table(
                {
                    "url": pa.array([], type=pa.string()),
                    "start": pa.array([], type=pa.int64()),
                    "end": pa.array([], type=pa.int64()),
                    "surface": pa.array([], type=pa.string()),
                    "etype": pa.array([], type=pa.string()),
                    "ids": pa.array([], type=pa.list_(pa.string())),
                }
            )
        m = t["mentions"].combine_chunks()
        if isinstance(m, pa.ChunkedArray):  # zero-chunk guard
            m = pa.concat_arrays(m.chunks or [pa.array([], pa.list_(_MENTION_TYPE))])
        counts = t["n_mentions"].to_numpy(zero_copy_only=False)
        urls = np.repeat(
            np.asarray(t["url"].to_pylist(), dtype=object), counts
        )
        flat = m.flatten()
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "start": flat.field("start"),
                "end": flat.field("end"),
                "surface": flat.field("surface"),
                "etype": flat.field("etype"),
                "ids": flat.field("ids"),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# ----------------------------------------------------- span recovery


def recover_spans(
    surfaces: list[str], text: str
) -> list[tuple[int, int]]:
    """n-th-occurrence span recovery (reference convert.py:428-464
    `get_bestplus_spans`): the k-th arrival of a surface maps to its
    k-th occurrence in ``text``. Returns EXCLUSIVE ends (reference's
    are inclusive). Surfaces containing 'No text' or not present are
    skipped (span (-1,-1)) rather than asserting."""
    counts: dict[str, int] = {}
    out = []
    for s in surfaces:
        if "No text" in s:
            out.append((-1, -1))
            continue
        counts[s] = counts.get(s, 0) + 1
        start, found = -1, 0
        try:
            while found < counts[s]:
                start = text.index(s, start + 1)
                found += 1
        except ValueError:
            out.append((-1, -1))
            continue
        out.append((start, start + len(s)))
    return out


# ------------------------------------------------------- converters


def pubtator_to_pubannotation(
    chunks: "ray.data.Dataset", chunk_col: str = "block"
) -> "ray.data.Dataset":
    """S6 (reference convert.py:351-425 `pubtator2pubannotation`):
    PubTator blocks -> PubAnnotation rows. ``text`` is
    title + ' ' + abstract; denotations keep document order with
    struct fields (begin, end, obj, ids); obj is the entity type
    (the reference keeps col 4 as ``obj`` and '|'-splits col 5 into
    ``id``)."""
    den_t = pa.struct(
        [
            ("begin", pa.int64()),
            ("end", pa.int64()),
            ("obj", pa.string()),
            ("ids", pa.list_(pa.string())),
        ]
    )

    def fn(t: pa.Table) -> pa.Table:
        docs = parse_pubtator_chunk(t, chunk_col)
        ok = docs.filter(pc.is_null(docs["error"]))
        texts, dens = [], []
        for title, abstract, ms in zip(
            ok["title"].to_pylist(),
            ok["abstract"].to_pylist(),
            ok["mentions"].to_pylist(),
        ):
            texts.append(title + " " + abstract)
            dens.append(
                [
                    {
                        "begin": m["start"],
                        "end": m["end"],
                        "obj": m["etype"],
                        "ids": m["ids"],
                    }
                    for m in ms
                ]
            )
        n = len(texts)
        return pa.table(
            {
                "project": pa.array(["BERN"] * n, type=pa.string()),
                "sourcedb": pa.array(["PubMed"] * n, type=pa.string()),
                "sourceid": ok["url"],
                "text": pa.array(texts, type=pa.string()),
                "denotations": pa.array(dens, type=pa.list_(den_t)),
            }
        )

    return chunks.map_batches(fn, batch_format="pyarrow")


def tmtool_json_batch(t: pa.Table, json_col: str = "payload") -> pa.Table:
    """S7 (reference convert.py:589-614 `tmtooljson2bern`): tmTool
    JSON payloads -> document rows with mutation mentions.

    Per reference semantics: the surface is sliced from ``text`` with
    the ORIGINAL (inclusive-end-style) span *before* the end+1 fixup
    (convert.py:597-598 slices, :599 then increments end); the
    normalized id strips a ``Mutation:`` prefix; etype is 'mutation'.
    Accepts both 'begin' (PubAnnotation) and 'start' span keys —
    the reference indexes d['span']['start'] on data whose writer
    emits 'begin' (convert.py:600 vs :420), so we take either."""
    rows = []
    for payload in t[json_col].to_pylist():
        if not payload:
            continue
        for td in json.loads(payload):
            text = td["text"]
            mentions = []
            for d in td.get("denotations", []):
                span = d["span"]
                begin = span.get("begin", span.get("start"))
                end = span["end"]
                surface = text[begin:end]
                mentions.append(
                    {
                        "start": begin,
                        "end": end + 1,
                        "surface": surface,
                        "etype": "mutation",
                        "ids": [
                            str(d.get("obj", "")).replace(
                                "Mutation:", ""
                            )
                        ],
                    }
                )
            rows.append(
                {
                    "url": td["sourceid"],
                    "text": text,
                    "mentions": mentions,
                }
            )
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "text": pa.array(
                [r["text"] for r in rows], type=pa.string()
            ),
            "n_mentions": pa.array(
                [len(r["mentions"]) for r in rows], type=pa.int64()
            ),
            "mentions": pa.array(
                [r["mentions"] for r in rows],
                type=pa.list_(_MENTION_TYPE),
            ),
        }
    )


def tmtool_json_to_mentions(
    payloads: "ray.data.Dataset", json_col: str = "payload"
) -> "ray.data.Dataset":
    return payloads.map_batches(
        lambda t: tmtool_json_batch(t, json_col), batch_format="pyarrow"
    )
