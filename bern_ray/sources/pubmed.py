"""PubMed / PMC efetch XML flatten (SURVEY.md §2.1 S8 wire formats).

The reference downloads PubMed citation XML and PMC full-text XML and
flattens each into title + abstract text before the PubTator pipeline
(reference `download.py:45-177 pubmed_xml2pubtator`,
`download.py:179-424 pmc_xml2pubtator` — xmltodict dict-walks). This
module re-expresses the SEMANTICS as batch parsers over XML-chunk
columns, like sources/bioc.py: each input row is one self-contained
XML document; chunks parallelize across `map_batches` tasks with no
cross-batch state. No network anywhere — ingest reads whatever rows a
Dataset supplies (files, parquet binary columns, test fixtures).

Reproduced semantics (reference line cites):

- PubMed: `<pre><PubmedArticle><MedlineCitation><Article>` — title =
  ArticleTitle (its DIRECT text when markup-structured, the
  xmltodict `#text` convention: nested element text is dropped);
  books fall back to `PubmedBookArticle/BookDocument` with
  `Book/BookTitle` (download.py:51-68). Abstract = every AbstractText
  element's direct text joined by single spaces, CopyrightInformation
  skipped (download.py:70-96); a missing Abstract is the reference's
  'No abstract pmid' None -> an error row here.
- PMC: title = front/article-meta/title-group/article-title; text =
  abstract `p` + abstract `sec/p` direct texts, then body `sec//p`
  direct texts, joined by single spaces (download.py:185-304).

Both emit the shared document schema (url/title/abstract/n_mentions/
mentions/error) so every downstream stage consumes the rows unchanged.
"""

from __future__ import annotations

import xml.etree.ElementTree as ElTree

import pyarrow as pa

import ray.data

from ..core.fold import fold_text_str
from .pubtator import _MENTION_TYPE


def _direct_text(el: "ElTree.Element | None") -> str:
    """The xmltodict `#text` of an element: text nodes DIRECTLY under
    it (element text + child tails), excluding child-element content —
    the reference drops nested markup text (download.py:62-63,
    '#text' lookups throughout)."""
    if el is None:
        return ""
    parts = [el.text or ""]
    parts.extend(c.tail or "" for c in el)
    # collapse the whitespace runs that dropping child elements leaves
    # behind (xmltodict strips per text node before joining)
    return " ".join("".join(parts).split())


def _doc_row(url: str, title: str, abstract: str, error: str | None):
    return {
        "url": url,
        "title": fold_text_str(title),
        "abstract": fold_text_str(abstract),
        "mentions": [],
        "error": error,
    }


def _parse_pubmed_doc(root: "ElTree.Element") -> dict:
    # the efetch text endpoint wraps the citation in <pre>; accept
    # both wrapped and bare documents
    pre = root if root.tag == "pre" else root
    article = pre.find(".//PubmedArticle/MedlineCitation/Article")
    book = pre.find(".//PubmedBookArticle/BookDocument")
    pmid_el = pre.find(".//PMID")
    pmid = _direct_text(pmid_el)
    if article is not None:
        title = _direct_text(article.find("ArticleTitle"))
        abstract_zone = article.find("Abstract")
    elif book is not None:
        title = _direct_text(book.find("ArticleTitle"))
        if not title:
            title = _direct_text(book.find("Book/BookTitle"))
        abstract_zone = book.find("Abstract")
    else:
        return _doc_row(pmid, "", "", "no PubmedArticle/BookDocument")
    if abstract_zone is None:
        # reference: 'No abstract pmid' -> None (download.py:71-73)
        return _doc_row(pmid, title, "", "no abstract")
    parts = [
        _direct_text(at)
        for at in abstract_zone.findall("AbstractText")
        if _direct_text(at)
    ]
    return _doc_row(pmid, title, " ".join(parts), None)


def _parse_pmc_doc(root: "ElTree.Element") -> dict:
    article = root if root.tag == "article" else root.find(".//article")
    if article is None:
        return _doc_row("", "", "", "no article element")
    meta = article.find("front/article-meta")
    pmcid = ""
    title = ""
    abstract_parts: list[str] = []
    if meta is not None:
        for aid in meta.findall("article-id"):
            if aid.get("pub-id-type") in (None, "pmc", "pmcid"):
                pmcid = _direct_text(aid) or pmcid
        title = _direct_text(
            meta.find("title-group/article-title")
        )
        # abstract p's, then abstract sec/p's (download.py:190-244)
        for abstract in meta.findall("abstract"):
            for p in abstract.findall("p"):
                t = _direct_text(p)
                if t:
                    abstract_parts.append(t)
            for sec in abstract.findall("sec"):
                for p in sec.findall("p"):
                    t = _direct_text(p)
                    if t:
                        abstract_parts.append(t)
    # body sec paragraphs (download.py:295-304 WIP parity: every
    # section's direct p texts, document order)
    body = article.find("body")
    if body is not None:
        for p in body.findall(".//sec/p"):
            t = _direct_text(p)
            if t:
                abstract_parts.append(t)
    if not title:
        return _doc_row(pmcid, "", "", "no article-title")
    return _doc_row(pmcid, title, " ".join(abstract_parts), None)


def _parse_chunks(t: pa.Table, chunk_col: str, parse_one) -> pa.Table:
    rows = []
    for chunk in t[chunk_col].to_pylist():
        if not chunk:
            continue
        try:
            root = ElTree.fromstring(chunk)
        except (ElTree.ParseError, ValueError, UnicodeDecodeError) as pe:
            rows.append(_doc_row("", "", "", f"XML ParseError: {pe}"))
            continue
        rows.append(parse_one(root))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "title": pa.array(
                [r["title"] for r in rows], type=pa.string()
            ),
            "abstract": pa.array(
                [r["abstract"] for r in rows], type=pa.string()
            ),
            "n_mentions": pa.array([0] * len(rows), type=pa.int64()),
            "mentions": pa.array(
                [r["mentions"] for r in rows],
                type=pa.list_(_MENTION_TYPE),
            ),
            "error": pa.array(
                [r["error"] for r in rows], type=pa.string()
            ),
        }
    )


def parse_pubmed_chunk(t: pa.Table, chunk_col: str = "xml") -> pa.Table:
    return _parse_chunks(t, chunk_col, _parse_pubmed_doc)


def parse_pmc_chunk(t: pa.Table, chunk_col: str = "xml") -> pa.Table:
    return _parse_chunks(t, chunk_col, _parse_pmc_doc)


def from_pubmed_docs(
    chunks: "ray.data.Dataset", chunk_col: str = "xml"
) -> "ray.data.Dataset":
    """Dataset of PubMed efetch XML chunks -> document Dataset with
    the shared schema (downstream-interchangeable with the PubTator
    and BioC sources)."""
    return chunks.map_batches(
        lambda t: parse_pubmed_chunk(t, chunk_col),
        batch_format="pyarrow",
    )


def from_pmc_docs(
    chunks: "ray.data.Dataset", chunk_col: str = "xml"
) -> "ray.data.Dataset":
    """Dataset of PMC full-text XML chunks -> document Dataset (title
    + flattened abstract/body text, reference pmc_xml2pubtator
    semantics)."""
    return chunks.map_batches(
        lambda t: parse_pmc_chunk(t, chunk_col),
        batch_format="pyarrow",
    )
