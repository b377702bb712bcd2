"""BioC XML ingest: synthetic collection round-trip into the shared
document schema, mutation-type filter, span relocation, and parse-error
row semantics (reference convert.py:201-298)."""

import pyarrow as pa
import pytest

import ray.data

from bern_ray.sources.bioc import from_bioc_docs, parse_bioc_chunk
from bern_ray.sources.pubtator import explode_mentions

BIOC = """<?xml version="1.0" encoding="UTF-8"?>
<collection>
  <document>
    <id>10001</id>
    <passage>
      <infon key="type">title</infon>
      <text>A V600E mutation study.</text>
      <annotation>
        <infon>tmVar:p|SUB|V|600|E</infon>
        <infon key="type">ProteinMutation</infon>
        <location offset="2" length="5"/>
        <text>V600E</text>
      </annotation>
    </passage>
    <passage>
      <infon key="type">abstract</infon>
      <text>The V600E variant and rs1234 were observed. V600E recurred.</text>
      <annotation>
        <infon>rs1234</infon>
        <infon key="type">SNP</infon>
        <location offset="46" length="6"/>
        <text>rs1234</text>
      </annotation>
      <annotation>
        <infon>tmVar:p|SUB|V|600|E</infon>
        <infon key="type">ProteinMutation</infon>
        <location offset="28" length="5"/>
        <text>V600E</text>
      </annotation>
      <annotation>
        <infon>not-a-mutation</infon>
        <infon key="type">Gene</infon>
        <location offset="0" length="3"/>
        <text>The</text>
      </annotation>
    </passage>
  </document>
  <document>
    <id>10002</id>
    <passage>
      <infon key="type">title</infon>
      <text>No annotations here.</text>
    </passage>
  </document>
</collection>
"""


def test_parse_bioc_chunk_table():
    t = parse_bioc_chunk(pa.table({"xml": pa.array([BIOC])}))
    assert t.num_rows == 2
    assert t["url"].to_pylist() == ["10001", "10002"]
    assert t["error"].to_pylist() == [None, None]
    # default filter keeps only mutation types -> the Gene row is out
    assert t["n_mentions"].to_pylist() == [3, 0]
    doc = t.to_pylist()[0]
    content = doc["title"] + " " + doc["abstract"]
    # spans re-located against the FUSED text (exclusive ends), sorted
    # by start, and each slice reproduces its surface
    starts = [m["start"] for m in doc["mentions"]]
    assert starts == sorted(starts)
    for m in doc["mentions"]:
        assert content[m["start"] : m["end"]] == m["surface"]
    # the duplicated V600E surface maps to DISTINCT occurrences
    v_spans = {
        (m["start"], m["end"])
        for m in doc["mentions"]
        if m["surface"] == "V600E"
    }
    assert len(v_spans) == 2
    # first infon is the identifier
    assert ["tmVar:p|SUB|V|600|E"] in [m["ids"] for m in doc["mentions"]]


def test_type_filter_none_keeps_all():
    t = parse_bioc_chunk(
        pa.table({"xml": pa.array([BIOC])}), type_filter=None
    )
    assert t["n_mentions"].to_pylist() == [4, 0]


def test_parse_error_row():
    t = parse_bioc_chunk(pa.table({"xml": pa.array(["<notxml"])}))
    assert t.num_rows == 1
    assert t["error"].to_pylist()[0].startswith("XML ParseError")


MULTI_PASSAGE = """<?xml version="1.0" encoding="UTF-8"?>
<collection>
  <document>
    <id>20001</id>
    <passage>
      <infon key="type">title</infon>
      <offset>0</offset>
      <text>BRAF kinase overview.</text>
    </passage>
    <passage>
      <infon key="type">paragraph</infon>
      <offset>22</offset>
      <text>The V600E variant alters BRAF.</text>
      <annotation>
        <infon>second-v600e</infon>
        <infon key="type">ProteinMutation</infon>
        <location offset="26" length="5"/>
        <text>V600E</text>
      </annotation>
    </passage>
    <passage>
      <infon key="type">paragraph</infon>
      <offset>53</offset>
      <text>V600E recurs here with rs77.</text>
      <annotation>
        <infon>rs77</infon>
        <infon key="type">SNP</infon>
        <location offset="76" length="4"/>
        <text>rs77</text>
      </annotation>
      <annotation>
        <infon>third-v600e</infon>
        <infon key="type">ProteinMutation</infon>
        <location offset="53" length="5"/>
        <text>V600E</text>
      </annotation>
    </passage>
  </document>
</collection>
"""


def test_multi_passage_global_offsets():
    """Real-world BioC: N typed passages fuse into one content stream;
    document-global location offsets order the repeated surface across
    passages even when annotations are serialized out of order."""
    t = parse_bioc_chunk(pa.table({"xml": pa.array([MULTI_PASSAGE])}))
    assert t.num_rows == 1
    doc = t.to_pylist()[0]
    assert doc["error"] is None
    assert doc["title"] == "BRAF kinase overview."
    # both paragraph passages fold into the abstract stream
    assert "V600E variant" in doc["abstract"]
    assert "recurs here" in doc["abstract"]
    content = doc["title"] + " " + doc["abstract"]
    for m in doc["mentions"]:
        assert content[m["start"] : m["end"]] == m["surface"]
    # offset sort assigns the FIRST V600E occurrence to the
    # lower-offset annotation (ids prove which annotation won)
    v = sorted(
        (m for m in doc["mentions"] if m["surface"] == "V600E"),
        key=lambda m: m["start"],
    )
    assert [m["ids"] for m in v] == [["second-v600e"], ["third-v600e"]]


def test_swapped_serialization_order_matches_offset_order():
    """ADVICE r4: two same-surface annotations serialized in REVERSED
    offset order must still get their n-th occurrences assigned by
    offset (the reference pre-sorts by start, convert.py:257-265)."""
    xml = """<collection><document><id>1</id><passage>
      <infon key="type">title</infon>
      <text>aa bb aa</text>
      <annotation><infon>late</infon>
        <infon key="type">ProteinMutation</infon>
        <location offset="6" length="2"/><text>aa</text></annotation>
      <annotation><infon>early</infon>
        <infon key="type">ProteinMutation</infon>
        <location offset="0" length="2"/><text>aa</text></annotation>
    </passage></document></collection>"""
    t = parse_bioc_chunk(pa.table({"xml": pa.array([xml])}))
    ms = sorted(t.to_pylist()[0]["mentions"], key=lambda m: m["start"])
    assert [m["ids"] for m in ms] == [["early"], ["late"]]
    assert [(m["start"], m["end"]) for m in ms] == [(0, 2), (6, 8)]


def test_missing_passage_type_is_error_not_misroute():
    """A passage with no direct type infon (only its annotation carries
    key='type') must flag an error row — and must NOT adopt the
    annotation's entity type as the passage type."""
    xml = """<collection><document><id>1</id><passage>
      <text>orphan text</text>
      <annotation><infon>x</infon>
        <infon key="type">title</infon>
        <location offset="0" length="6"/><text>orphan</text></annotation>
    </passage></document></collection>"""
    t = parse_bioc_chunk(
        pa.table({"xml": pa.array([xml])}), type_filter=None
    )
    doc = t.to_pylist()[0]
    assert doc["error"] is not None and "infon" in doc["error"]
    # the annotation's key='type' infon (value 'title') did NOT route
    # 'orphan text' into the title
    assert doc["title"] == ""


def test_annotation_missing_infons_yields_empty_ids():
    xml = """<collection><document><id>1</id><passage>
      <infon key="type">title</infon>
      <text>V600E seen.</text>
      <annotation>
        <location offset="0" length="5"/><text>V600E</text></annotation>
    </passage></document></collection>"""
    t = parse_bioc_chunk(
        pa.table({"xml": pa.array([xml])}), type_filter=None
    )
    doc = t.to_pylist()[0]
    assert doc["error"] is None
    assert [m["ids"] for m in doc["mentions"]] == [[]]


def test_non_utf8_bytes_chunk_is_error_row():
    bad = b"<?xml version='1.0' encoding='utf-8'?><collection>\xff\xfe</collection>"
    t = parse_bioc_chunk(pa.table({"xml": pa.array([bad], type=pa.binary())}))
    assert t.num_rows == 1
    assert t["error"].to_pylist()[0] is not None


def test_dataset_roundtrip_and_explode(ray_session):
    ds = ray.data.from_arrow(pa.table({"xml": pa.array([BIOC])}))
    docs = from_bioc_docs(ds)
    flat = explode_mentions(docs).to_pandas()
    assert len(flat) == 3
    assert set(flat["etype"]) == {"ProteinMutation", "SNP"}
    assert (flat["url"] == "10001").all()
