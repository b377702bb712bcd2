"""Extraction invariants (FIXTURES.md §6 item 1 + §5 edge cases)."""

import pyarrow as pa
import pyarrow.compute as pc

from bern_ray.core.fold import SPECIES_STOPLIST
from bern_ray.sources import dicts
from bern_ray.sources.pages import (
    pages_table,
    planted_mentions,
    planted_mirna,
    url_of,
)
from bern_ray.stages.extract import (
    MentionExtractor,
    extract_texts,
    mention_id_of,
)

SF = "/root/testdata/sf0.001"


def test_html_extraction_byte_identical():
    t = pages_table(SF)
    ex = extract_texts(t["html"].combine_chunks())
    assert pc.all(pc.equal(ex, t["text"].combine_chunks())).as_py()


def test_extractor_finds_planted_mentions():
    t = pages_table(SF)
    out = MentionExtractor()(t)
    df = out.to_pandas()
    by_url = {u: g for u, g in df.groupby("url")}
    missing = 0
    for doc_id in range(200):
        url = url_of(doc_id)
        got = set(by_url[url]["surface"]) if url in by_url else set()
        for _, surf in planted_mentions(doc_id):
            # the fold may rewrite whitespace inside the alias
            from bern_ray.core.fold import fold_text_str

            if fold_text_str(surf) not in got:
                missing += 1
    assert missing == 0


def test_surface_equals_text_slice():
    t = pages_table(SF)
    out = MentionExtractor()(t)
    texts = dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    for r in out.to_pylist():
        assert texts[r["url"]][r["start"] : r["end"]] == r["surface"]
        assert r["mention_id"] == mention_id_of(r["url"], r["start"])


def test_stoplist_species_filtered():
    t = pages_table(SF)
    out = MentionExtractor()(t)
    surfaces = set(out["surface"].to_pylist())
    assert not (surfaces & SPECIES_STOPLIST)


def test_mirna_pattern_tagged():
    t = pages_table(SF)
    out = MentionExtractor()(t)
    df = out.to_pandas()
    for doc_id in range(500):
        mir = planted_mirna(doc_id)
        if mir is None:
            continue
        g = df[df.url == url_of(doc_id)]
        assert mir in set(g.surface), (doc_id, mir)


def test_span_conflict_duel_longest_wins():
    # two overlapping candidates: dict alias inside a longer alias
    ex = MentionExtractor()
    # synthesize text containing a dict surface with a ' gene' suffix;
    # gazetteer must emit the longest alternative only
    i = next(
        j for j in range(dicts.N_OIDS) if j % 7 == 0 and j % 3 == 0
    )  # gene with ' gene' alias
    long_alias = [a for a in dicts.aliases_of(i) if a.endswith(" gene")][0]
    text = f"prefix {long_alias} suffix"
    rows = ex._tag_one("u", text)
    assert len(rows) == 1
    assert rows[0][3] == long_alias


def test_span_conflict_duel_score_beats_length():
    """Score-first duel (ops.py:214-476 analog): a shorter span with a
    higher confidence beats a longer overlapping span with a lower
    one; the length rule only breaks score ties."""
    i = next(
        j for j in range(dicts.N_OIDS) if j % 7 == 0 and j % 3 == 0
    )
    long_alias = [a for a in dicts.aliases_of(i) if a.endswith(" gene")][0]
    short_alias = long_alias[: -len(" gene")]
    assert short_alias in dicts.aliases_of(i)
    text = f"prefix {long_alias} suffix"

    # demote the long alias below the default: short one must win now
    ex = MentionExtractor(surface_conf={long_alias: 0.5})
    rows = ex._tag_one("u", text)
    assert len(rows) == 1
    assert rows[0][3] == short_alias
    assert rows[0][5] == 0.9  # DICT_CONF carried on the mention

    # equal scores -> longest wins (tie-break preserved)
    ex2 = MentionExtractor()
    rows2 = ex2._tag_one("u", text)
    assert len(rows2) == 1 and rows2[0][3] == long_alias


def test_mentions_carry_score_column():
    t = pages_table(SF).slice(0, 8)
    out = MentionExtractor()(t)
    assert "score" in out.schema.names
    sc = out["score"].to_pylist()
    assert sc and all(0.0 < s <= 1.0 for s in sc)


def test_sentence_mode_spans_match_whole_text():
    """M5-M7 pipeline parity: scanning per sentence unit (title kept
    whole, spans offset back to document coordinates) yields exactly
    the whole-text spans on the corpus — no dictionary surface crosses
    a sentence boundary."""
    from bern_ray.stages.extract import MentionExtractor

    t = pages_table(SF)
    whole = MentionExtractor()
    sent = MentionExtractor(sentence_mode=True)
    batch = t.slice(0, 200)
    a = whole(batch).to_pandas()
    b = sent(batch).to_pandas()
    key = ["url", "start", "end", "etype", "surface"]
    assert len(a) > 0
    assert a[key].sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True)
    )


def test_sentence_units_cover_text_and_keep_title_whole():
    from bern_ray.stages.extract import MentionExtractor

    ex = MentionExtractor(sentence_mode=True)
    text = "BRCA1 study title\nFirst sentence here. Second one. Third."
    units = ex._units(text)
    # first unit is the whole title line
    assert units[0] == (0, "BRCA1 study title\n")
    # offsets are document coordinates: segment == text slice
    for off, seg in units:
        assert text[off : off + len(seg)] == seg
    assert len(units) >= 3
