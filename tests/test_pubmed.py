"""PubMed/PMC efetch XML flatten (reference download.py:45-424):
synthetic fixtures for each dict-walk branch the reference handles —
plain + structured AbstractText, CopyrightInformation skip, book
fallback, missing abstract error, PMC abstract p/sec-p + body sec p,
and the xmltodict '#text' convention (nested markup text dropped)."""

import pyarrow as pa

import ray.data

from bern_ray.sources.pubmed import (
    from_pmc_docs,
    from_pubmed_docs,
    parse_pmc_chunk,
    parse_pubmed_chunk,
)

PUBMED = """<pre>
  <PubmedArticle><MedlineCitation>
    <PMID Version="1">12345</PMID>
    <Article>
      <ArticleTitle>BRAF mutations in melanoma.</ArticleTitle>
      <Abstract>
        <AbstractText Label="BACKGROUND">V600E is common.</AbstractText>
        <AbstractText Label="RESULTS">We found <i>many</i> cases.</AbstractText>
        <CopyrightInformation>(c) 2020 Elsevier.</CopyrightInformation>
      </Abstract>
    </Article>
  </MedlineCitation></PubmedArticle>
</pre>"""

PUBMED_BOOK = """<pre>
  <PubmedBookArticle><BookDocument>
    <PMID>67890</PMID>
    <Book><BookTitle>GeneReviews entry.</BookTitle></Book>
    <Abstract>
      <AbstractText>A book abstract.</AbstractText>
    </Abstract>
  </BookDocument></PubmedBookArticle>
</pre>"""

PUBMED_NO_ABSTRACT = """<pre>
  <PubmedArticle><MedlineCitation>
    <PMID>111</PMID>
    <Article><ArticleTitle>No abstract here.</ArticleTitle></Article>
  </MedlineCitation></PubmedArticle>
</pre>"""

PMC = """<article>
  <front><article-meta>
    <article-id pub-id-type="pmc">PMC42</article-id>
    <title-group><article-title>A PMC article.</article-title></title-group>
    <abstract>
      <p>First abstract paragraph.</p>
      <sec><title>Methods</title><p>Sectioned abstract text.</p></sec>
    </abstract>
  </article-meta></front>
  <body>
    <sec><title>Intro</title><p>Body paragraph one.</p></sec>
    <sec><p>Body paragraph <italic>with markup</italic> tail.</p></sec>
  </body>
</article>"""


def test_pubmed_flatten_and_copyright_skip():
    t = parse_pubmed_chunk(pa.table({"xml": pa.array([PUBMED])}))
    doc = t.to_pylist()[0]
    assert doc["url"] == "12345"
    assert doc["error"] is None
    assert doc["title"] == "BRAF mutations in melanoma."
    # AbstractText elements joined by single spaces; copyright skipped;
    # nested <i> markup text dropped (xmltodict '#text' convention,
    # download.py:85-90) but the tail after it kept
    assert doc["abstract"] == "V600E is common. We found cases."
    assert "Elsevier" not in doc["abstract"]


def test_pubmed_book_fallback():
    t = parse_pubmed_chunk(pa.table({"xml": pa.array([PUBMED_BOOK])}))
    doc = t.to_pylist()[0]
    assert doc["error"] is None
    assert doc["url"] == "67890"
    assert doc["title"] == "GeneReviews entry."
    assert doc["abstract"] == "A book abstract."


def test_pubmed_missing_abstract_is_error_row():
    t = parse_pubmed_chunk(
        pa.table({"xml": pa.array([PUBMED_NO_ABSTRACT])})
    )
    doc = t.to_pylist()[0]
    assert doc["error"] == "no abstract"
    assert doc["title"] == "No abstract here."
    assert doc["abstract"] == ""


def test_pmc_flatten_order_and_markup():
    t = parse_pmc_chunk(pa.table({"xml": pa.array([PMC])}))
    doc = t.to_pylist()[0]
    assert doc["error"] is None
    assert doc["url"] == "PMC42"
    assert doc["title"] == "A PMC article."
    # abstract p, abstract sec/p, then body sec p's in document order;
    # nested <italic> content dropped, its tail kept
    assert doc["abstract"] == (
        "First abstract paragraph. Sectioned abstract text. "
        "Body paragraph one. Body paragraph tail."
    )


def test_parse_error_and_dataset_roundtrip(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"xml": pa.array([PUBMED, "<notxml", PMC])})
    )
    out = from_pubmed_docs(ds).to_pandas()
    assert len(out) == 3
    assert out["error"].iloc[1].startswith("XML ParseError")
    # the shared document schema: same columns as the other sources
    assert list(out.columns) == [
        "url",
        "title",
        "abstract",
        "n_mentions",
        "mentions",
        "error",
    ]
    pmc_out = from_pmc_docs(
        ray.data.from_arrow(pa.table({"xml": pa.array([PMC])}))
    ).to_pandas()
    assert pmc_out["url"].iloc[0] == "PMC42"


def test_pubmed_roundtrip_query_matches_oracle(ray_session, tmp_path):
    """q_pubmed_roundtrip == its DuckDB oracle on adversarial text:
    XML-special characters, exotic whitespace and >50-char words all
    vanish under the token-normalized synthesis, so write->parse is an
    exact identity through BOTH wire formats."""
    import duckdb
    import pandas as pd

    from bern_ray.pipelines.relational import (
        SQL_PUBMED_ROUNDTRIP,
        q_pubmed_roundtrip,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "Tricky <tag> & \"quoted\" text with 'entities'",
                "word " + "x" * 60 + " tail\r\n\ttabbed nbsp",
                "...leading punctuation only, no title token?!",
                "plain ascii text",
            ],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    got = (
        q_pubmed_roundtrip(str(sf))
        .to_pandas()
        .sort_values(["src", "url"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = (
        con.execute(SQL_PUBMED_ROUNDTRIP)
        .df()
        .sort_values(["src", "url"])
        .reset_index(drop=True)
    )
    # doc 3 has no leading alnum token -> filtered on both sides
    assert len(got) == 6
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the >50-char word was truncated by the fold on both sides
    long_doc = got[(got.src == "pubmed") & (got.url == "2")]
    assert "x" * 50 in long_doc.abstract.iloc[0]
    assert "x" * 51 not in long_doc.abstract.iloc[0]
