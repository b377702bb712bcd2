"""WordPiece featurize / detokenize ground truth (SURVEY.md M8-M9).

Pins the greedy longest-match-first semantics, [CLS]/[SEP]/pad
framing, 30-word pre-chunking, and the `##`-merge / [SEP]-split
detokenizer against hand-computed cases, plus a corpus round-trip
through the distributed stage."""

import pyarrow as pa
import pytest

from bern_ray.core.wordpiece import (
    CLS,
    PAD,
    SEP,
    UNK,
    build_vocab,
    chunk_words,
    detokenize,
    encode_word,
    featurize,
)


def _vocab(words, extra=()):
    counts = {w: 10 for w in words}
    v = build_vocab(counts, vocab_size=100000)
    for p in extra:
        if p not in v:
            v[p] = len(v)
    return v


def test_greedy_longest_match():
    # the canonical BERT example: un ##aff ##able
    v = {p: i for i, p in enumerate(
        [PAD, UNK, CLS, SEP, "un", "##aff", "##able", "unaff"]
    )}
    assert encode_word("unaffable", v) == ["unaff", "##able"]
    del v["unaff"]
    assert encode_word("unaffable", v) == ["un", "##aff", "##able"]


def test_unk_on_unencodable():
    v = {p: i for i, p in enumerate([PAD, UNK, CLS, SEP, "ab"])}
    # 'c' has no piece -> whole word collapses to [UNK]
    assert encode_word("abc", v) == [UNK]
    # overlong word -> [UNK] without scanning
    big = _vocab(["x"])
    assert encode_word("x" * 101, big) == [UNK]


def test_whole_word_beats_pieces():
    v = _vocab(["linkage", "link"])
    assert encode_word("linkage", v) == ["linkage"]


def test_char_fallback_never_unk_over_alphabet():
    v = _vocab(["the"])  # alphabet = {t, h, e}
    assert encode_word("teeth", v) == ["t", "##e", "##e", "##t", "##h"]


def test_featurize_framing_and_padding():
    v = _vocab(["entity", "resolution"])
    ids, mask, seg, n_pieces, n_unk = featurize(
        ["entity", "resolution"], v, max_seq_length=16
    )
    assert len(ids) == len(mask) == len(seg) == 16
    assert ids[0] == v[CLS]
    assert ids[3] == v[SEP]
    assert mask == [1] * 4 + [0] * 12
    assert set(ids[4:]) == {v[PAD]}
    assert seg == [0] * 16
    assert (n_pieces, n_unk) == (2, 0)


def test_featurize_truncates_at_max_minus_2():
    v = _vocab(["a"])
    words = ["a"] * 50
    ids, mask, _seg, n_pieces, _ = featurize(words, v, max_seq_length=16)
    assert n_pieces == 50
    assert sum(mask) == 16  # CLS + 14 kept + SEP
    assert ids[15] == v[SEP]


def test_chunk_words_30_window():
    words = [str(i) for i in range(65)]
    chunks = chunk_words(words, window=30)
    assert [len(c) for c in chunks] == [30, 30, 5]
    assert chunks[2] == ["60", "61", "62", "63", "64"]
    assert chunk_words([], window=30) == []


def test_detokenize_merges_and_splits():
    pieces = [CLS, "un", "##aff", "##able", SEP, "rec", "##ord", SEP, PAD]
    labels = ["O", "B", "I", "I", "O", "B", "I", "O", "O"]
    sents, labs = detokenize(pieces, labels)
    assert sents == [["unaffable"], ["record"]]
    # merged word takes the label of its FIRST piece (ops.py:479-510)
    assert labs == [["B"], ["B"]]


def test_roundtrip_encode_detokenize():
    v = _vocab(["record", "linkage", "ray", "over", "data"])
    # 'dataray' exercises char-continuation pieces; the rest are
    # whole-word pieces — all chars are in the corpus alphabet, so the
    # round-trip is exact
    words = ["record", "linkage", "over", "ray", "dataray"]
    pieces = []
    for w in words:
        pieces.extend(encode_word(w, v))
    sents, _ = detokenize(pieces)
    assert sents == [words]


def test_build_vocab_deterministic_and_complete():
    counts = {"beta": 5, "alpha": 5, "gamma": 9}
    v1 = build_vocab(counts, vocab_size=1000)
    v2 = build_vocab(dict(reversed(list(counts.items()))), vocab_size=1000)
    assert v1 == v2
    # ties broken by word asc; higher count first
    order = [w for w in ("gamma", "alpha", "beta")]
    idx = [v1[w] for w in order]
    assert idx == sorted(idx)
    # every seen char present as start AND continuation piece
    for c in "betalphgm":
        assert c in v1 and "##" + c in v1


@pytest.mark.usefixtures("ray_session")
def test_wordpiece_features_stage():
    import ray.data

    from bern_ray.functions.wordpiece import (
        build_corpus_vocab,
        wordpiece_features,
    )

    texts = [
        "record linkage over ray data " * 8,  # 40 words -> 2 chunks
        "entity resolution",
        "",
    ]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": texts})
    )
    out = wordpiece_features(
        docs, vocab_size=64, max_seq_length=32, concurrency=(1, 2)
    ).to_pandas()
    assert set(out["doc_id"]) == {1, 2}  # empty doc emits no chunks
    d1 = out[out["doc_id"] == 1].sort_values("chunk_idx")
    assert list(d1["chunk_idx"]) == [0, 1]
    # fixed-width rows
    assert all(len(r) == 32 for r in out["input_ids"])
    assert all(len(r) == 32 for r in out["input_mask"])
    # frequent corpus words are whole-word pieces -> zero [UNK]
    assert int(out["n_unk"].sum()) == 0
    vocab = build_corpus_vocab(docs, vocab_size=64)
    assert "record" in vocab and "linkage" in vocab
    # chunk 0 of doc 1: 30 words, all whole-word -> 30 pieces + frame
    row0 = d1.iloc[0]
    assert row0["n_pieces"] == 30
    assert sum(row0["input_mask"]) == 32  # truncated exactly to frame
