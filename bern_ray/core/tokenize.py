"""Tokenizer / sentence-splitter family (SURVEY.md §2.2 M4-M7).

Pure in-UDF functions used by extraction-style stages; semantics
mirror the reference:

- `conll_tokenize`: regex split into alnum runs vs single non-alnum
  chars, spaces dropped, with the LOSSLESS invariant (rejoining tokens
  + spaces reproduces the input — reference assert ops.py:93).
- `sentence_split`: rule-based split on `.?!` followed by a space +
  plausible sentence start; sentences longer than `max_tokens` are
  re-chunked into fixed-size token windows (reference ops.py:98-166).
- `word_positions`: per-sentence word list + EXCLUSIVE character span
  per word into the original text (the reference emits inclusive ends,
  ops.py:55-58, then fixes them up at normalize.py:206 — we freeze
  exclusive once; words longer than `max_word_chars` are truncated for
  the token list but spans always cover the full original word,
  reference ops.py:50-53).
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[0-9a-zA-Z]+|[^0-9a-zA-Z]")
_SENT_END = re.compile(r"[.?!] ")


def conll_tokenize(text: str) -> list[str]:
    """Alnum-run / single-char tokens, spaces dropped; lossless."""
    toks = [t for t in _TOKEN_RE.findall(text) if t != " "]
    # lossless invariant: removing spaces from the input reproduces
    # the concatenation of tokens (reference assert, ops.py:93)
    assert "".join(toks) == text.replace(" ", "")
    return toks


def sentence_split(
    text: str, max_tokens: int = 100, chunk_tokens: int = 200
) -> list[tuple[int, int]]:
    """(start, end) exclusive spans of sentences within `text`.

    Split after `.?!` + space when the next char plausibly starts a
    sentence (uppercase letter or digit). Overlong sentences are
    re-chunked into windows of `chunk_tokens` whitespace tokens.
    """
    if not text:
        return []
    bounds = [0]
    for m in _SENT_END.finditer(text):
        nxt = m.end()
        if nxt < len(text) and (text[nxt].isupper() or text[nxt].isdigit()):
            bounds.append(nxt)
    bounds.append(len(text))
    spans: list[tuple[int, int]] = []
    for s, e in zip(bounds, bounds[1:]):
        if s >= e:
            continue
        seg = text[s:e]
        if len(seg.split()) <= max_tokens:
            spans.append((s, e))
            continue
        # re-chunk by raw whitespace tokens (reference ops.py:141-166)
        pos = s
        words = []
        for wm in re.finditer(r"\S+", seg):
            words.append((s + wm.start(), s + wm.end()))
        for i in range(0, len(words), chunk_tokens):
            chunk = words[i : i + chunk_tokens]
            spans.append((chunk[0][0], chunk[-1][1]))
        pos = e
    return spans


def word_positions(
    text: str, max_word_chars: int = 20, trunc_to: int = 10
) -> tuple[list[str], list[tuple[int, int]]]:
    """Words + exclusive (start, end) spans; overlong words truncated
    in the word list (>max_word_chars -> first trunc_to chars,
    reference ops.py:50-53) while spans keep the true extent."""
    words: list[str] = []
    spans: list[tuple[int, int]] = []
    for m in re.finditer(r"\S+", text):
        w = m.group(0)
        words.append(w if len(w) <= max_word_chars else w[:trunc_to])
        spans.append((m.start(), m.end()))
    return words, spans
