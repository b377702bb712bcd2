"""Tokenizer family invariants (reference ops.py:5-166 analogs)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bern_ray.core.tokenize import (
    conll_tokenize,
    sentence_split,
    word_positions,
)


def test_conll_tokenize_basic():
    assert conll_tokenize("ab-cd ef") == ["ab", "-", "cd", "ef"]
    assert conll_tokenize("") == []
    assert conll_tokenize("a  b") == ["a", "b"]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcZ 09-_.!", max_size=60))
def test_conll_lossless(text):
    toks = conll_tokenize(text)
    assert "".join(toks) == text.replace(" ", "")


def test_sentence_split_spans_cover():
    text = "First sentence. Second one! Third? no Fourth. 5 starts here."
    spans = sentence_split(text)
    assert spans[0][0] == 0
    assert spans[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2 or e1 == s2  # ordered, non-overlapping
    # 'no Fourth' does not start a new sentence (lowercase after ?)
    joined = [text[s:e] for s, e in spans]
    assert any("Third? no Fourth." in j for j in joined)


def test_sentence_rechunk_long():
    text = " ".join(f"w{i}" for i in range(450)) + "."
    spans = sentence_split(text, max_tokens=100, chunk_tokens=200)
    assert len(spans) == 3  # 450 tokens -> 200+200+50
    assert spans[0][0] == 0
    for s, e in spans:
        assert text[s] != " " and text[e - 1] != " "


def test_word_positions_exclusive_and_trunc():
    text = "short " + "x" * 25 + " end"
    words, spans = word_positions(text)
    assert words[0] == "short" and spans[0] == (0, 5)
    assert words[1] == "x" * 10  # truncated token
    assert spans[1] == (6, 31)  # full original extent
    for w, (s, e) in zip(["short", None, "end"], spans):
        assert text[s:e].startswith(text[s:e])  # spans index the text
    assert text[spans[2][0] : spans[2][1]] == "end"
