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


def test_dataset_roundtrip_and_explode(ray_session):
    ds = ray.data.from_arrow(pa.table({"xml": pa.array([BIOC])}))
    docs = from_bioc_docs(ds)
    flat = explode_mentions(docs).to_pandas()
    assert len(flat) == 3
    assert set(flat["etype"]) == {"ProteinMutation", "SNP"}
    assert (flat["url"] == "10001").all()
