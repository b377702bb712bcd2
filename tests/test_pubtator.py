"""Full PubTator document format + S6/S7 converters
(bern_ray/sources/pubtator.py vs reference convert.py semantics)."""

import json

import pyarrow as pa
import pytest

import ray.data

from bern_ray.sources.pubtator import (
    MUTATION_TYPES,
    explode_mentions,
    from_pubtator_docs,
    parse_pubtator_chunk,
    pubtator_to_pubannotation,
    recover_spans,
    split_title,
    tmtool_json_batch,
    to_pubtator_docs,
)


def _docs_table():
    return pa.table(
        {
            "url": pa.array(
                ["https://a.example/1", "https://b.example/2"]
            ),
            "title": pa.array(["Alpha beta.", "Solo title"]),
            "abstract": pa.array(["Gamma delta epsilon.", ""]),
        }
    )


def _mentions_table():
    # spans index into title + ' ' + abstract
    return pa.table(
        {
            "url": pa.array(
                [
                    "https://a.example/1",
                    "https://a.example/1",
                    "https://b.example/2",
                ]
            ),
            "start": pa.array([0, 12, 5], type=pa.int64()),
            "end": pa.array([5, 17, 10], type=pa.int64()),
            "surface": pa.array(["Alpha", "Gamma", "title"]),
            "etype": pa.array(["gene", "disease", "species"]),
            "ids": pa.array(
                [["G:1", "G:2"], ["D:9"], []],
                type=pa.list_(pa.string()),
            ),
        }
    )


def test_roundtrip_write_parse_explode():
    docs = ray.data.from_arrow(_docs_table())
    mentions = ray.data.from_arrow(_mentions_table())
    blocks = to_pubtator_docs(docs, mentions, num_buckets=4)
    bt = pa.Table.from_pylist(blocks.take_all())
    assert bt.num_rows == 2
    # every block has |t| and |a| header lines
    for block in bt["block"].to_pylist():
        lines = block.rstrip("\n").split("\n")
        assert "|t|" in lines[0] and "|a|" in lines[1]

    parsed = from_pubtator_docs(ray.data.from_arrow(bt))
    flat = pa.Table.from_pylist(explode_mentions(parsed).take_all())
    want = _mentions_table()
    got = flat.to_pandas().sort_values(["url", "start"]).reset_index(drop=True)
    exp = want.to_pandas().sort_values(["url", "start"]).reset_index(drop=True)
    for col in ("url", "start", "end", "surface", "etype"):
        assert got[col].tolist() == exp[col].tolist()
    assert [list(x) for x in got["ids"]] == [list(x) for x in exp["ids"]]
    # doc text survives: title + ' ' + abstract
    pd_docs = pa.Table.from_pylist(parsed.take_all()).to_pandas()
    pd_docs = pd_docs.sort_values("url").reset_index(drop=True)
    assert pd_docs["title"].tolist() == ["Alpha beta.", "Solo title"]
    assert pd_docs["abstract"].tolist() == [
        "Gamma delta epsilon.",
        "",
    ]
    assert pd_docs["error"].isna().all()


def test_parse_sentinels_and_errors():
    chunk = (
        "p1|t|- No text -\n"
        "p1|a|-NoAbstract-\n"
        "p1\t0\t3\tfoo\tgene\tG:1\n"
        "\n"
        "p2|t|ok title\n"
        "p3|a|mismatched id\n"
        "\n"
        "p4|t|bad mention cols\n"
        "p4|a|abs\n"
        "p4\t0\t3\tonly-five\tcols\n"
    )
    t = parse_pubtator_chunk(pa.table({"block": [chunk]}))
    d = t.to_pylist()
    assert d[0]["title"] == "" and d[0]["abstract"] == ""
    assert d[0]["n_mentions"] == 1 and d[0]["error"] is None
    assert d[1]["error"] == "pmid disagreement"
    assert "wrong #mention_cols" in d[2]["error"]


def test_parse_type_filter_s2():
    chunk = (
        "p1|t|t\n"
        "p1|a|a\n"
        "p1\t0\t1\tx\tProteinMutation\tM:1\n"
        "p1\t1\t2\ty\tChemical\tC:1\n"
        "p1\t2\t3\tz\tSNP\tM:2\n"
    )
    t = parse_pubtator_chunk(
        pa.table({"block": [chunk]}), type_filter=MUTATION_TYPES
    )
    ms = t["mentions"].to_pylist()[0]
    assert [m["etype"] for m in ms] == ["ProteinMutation", "SNP"]


def test_mentions_sorted_by_start():
    chunk = (
        "p|t|t\np|a|a\n"
        "p\t9\t10\tb\tgene\tG\n"
        "p\t1\t2\ta\tgene\tG\n"
    )
    t = parse_pubtator_chunk(pa.table({"block": [chunk]}))
    ms = t["mentions"].to_pylist()[0]
    assert [m["start"] for m in ms] == [1, 9]


def test_split_title_preserves_fused_coordinates():
    t = pa.table(
        {
            "text": pa.array(
                [
                    "First sentence. Rest of the doc here.",
                    "no sentence break at all",
                ]
            )
        }
    )
    out = split_title(t)
    titles = out["title"].to_pylist()
    absts = out["abstract"].to_pylist()
    for txt, ti, ab in zip(t["text"].to_pylist(), titles, absts):
        fused = ti + " " + ab if ab else ti
        assert fused == txt
    assert titles[0] == "First sentence."
    assert absts[1] == ""


def test_pubannotation_converter_s6():
    chunk = (
        "p9|t|Tt.\np9|a|Ab ab\n"
        "p9\t0\t2\tTt\tdisease\tD:1|D:2\n"
    )
    out = pubtator_to_pubannotation(
        ray.data.from_arrow(pa.table({"block": [chunk]}))
    )
    rows = out.take_all()
    assert rows[0]["project"] == "BERN"
    assert rows[0]["sourcedb"] == "PubMed"
    assert rows[0]["sourceid"] == "p9"
    assert rows[0]["text"] == "Tt. Ab ab"
    den = rows[0]["denotations"][0]
    assert den["begin"] == 0 and den["end"] == 2
    assert den["obj"] == "disease"
    assert list(den["ids"]) == ["D:1", "D:2"]


def test_tmtool_converter_s7():
    payload = json.dumps(
        [
            {
                "sourceid": "doc1",
                "text": "the V600E variant",
                "denotations": [
                    {
                        "span": {"begin": 4, "end": 9},
                        "obj": "Mutation:p.V600E",
                    }
                ],
            }
        ]
    )
    t = tmtool_json_batch(pa.table({"payload": [payload]}))
    m = t["mentions"].to_pylist()[0][0]
    # surface sliced BEFORE the end+1 fixup (reference convert.py:597-599)
    assert m["surface"] == "V600E"
    assert m["start"] == 4 and m["end"] == 10
    assert m["ids"] == ["p.V600E"]
    assert m["etype"] == "mutation"


def test_recover_spans_nth_occurrence():
    text = "aa bb aa cc aa"
    spans = recover_spans(["aa", "aa", "bb", "aa", "zz", "No text"], text)
    assert spans[0] == (0, 2)
    assert spans[1] == (6, 8)  # second arrival -> second occurrence
    assert spans[2] == (3, 5)
    assert spans[3] == (12, 14)
    assert spans[4] == (-1, -1)  # absent
    assert spans[5] == (-1, -1)  # 'No text' skip
    for s, e in [x for x in spans if x != (-1, -1)]:
        assert text[s:e] in ("aa", "bb")
