"""WordPiece featurize / detokenize (SURVEY.md §2.2 M8-M9).

Parity surface, cited against the reference:

- `run_ner.py:785-847` (`convert_single_example`): [CLS]/[SEP]
  framing, `input_ids` / `input_mask` / `segment_ids` padded to
  `max_seq_length`, piece list truncated at `max_seq_length - 2`.
- `run_ner.py:157-190` + flag `run_ner.py:63-66`: 30-word window
  pre-chunking before featurization.
- `ops.py:479-510` (`detokenize`): re-merge `##` word pieces, split
  sentences at [SEP]; a merged word carries the label of its FIRST
  piece.

The reference ships a fixed 28996-entry BERT vocab file; this repo
derives a deterministic vocab from the corpus instead (specials +
every seen character as both start and `##` continuation pieces +
top-frequency whole words).  The encode ALGORITHM — greedy
longest-match-first with `##` continuation and [UNK] fallback — is
the BERT WordPiece semantics and the parity surface here.

Pure in-UDF functions; the Ray-side stage lives in
`bern_ray/functions/wordpiece.py`.
"""

from __future__ import annotations

PAD = "[PAD]"
UNK = "[UNK]"
CLS = "[CLS]"
SEP = "[SEP]"
SPECIALS = (PAD, UNK, CLS, SEP)


def build_vocab(
    word_counts: dict[str, int], vocab_size: int = 8192
) -> dict[str, int]:
    """Deterministic piece->id vocab.

    Layout: specials, then every character seen in any word (as both a
    start piece and a `##` continuation piece — guarantees any word
    over the seen alphabet encodes without [UNK]), then whole words by
    (count desc, word asc) until `vocab_size`.
    """
    chars = sorted({c for w in word_counts for c in w})
    pieces: list[str] = list(SPECIALS)
    pieces += chars
    pieces += ["##" + c for c in chars]
    seen = set(pieces)
    for w, _ in sorted(word_counts.items(), key=lambda kv: (-kv[1], kv[0])):
        if len(pieces) >= vocab_size:
            break
        if w not in seen and len(w) > 1:
            pieces.append(w)
            seen.add(w)
    return {p: i for i, p in enumerate(pieces)}


def encode_word(
    word: str, vocab: dict[str, int], max_chars: int = 100
) -> list[str]:
    """Greedy longest-match-first WordPiece split of one word.

    Continuation pieces carry the `##` prefix; a word with any
    un-encodable span collapses to a single [UNK] (BERT
    `WordpieceTokenizer` semantics, mirrored by the reference's
    bundled tokenizer)."""
    if not word:
        return []
    if len(word) > max_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def chunk_words(words: list[str], window: int = 30) -> list[list[str]]:
    """Fixed 30-word window pre-chunking (run_ner.py:157-190)."""
    if not words:
        return []
    return [words[i : i + window] for i in range(0, len(words), window)]


def featurize(
    words: list[str],
    vocab: dict[str, int],
    max_seq_length: int = 256,
) -> tuple[list[int], list[int], list[int], int, int]:
    """Words -> (input_ids, input_mask, segment_ids, n_pieces, n_unk).

    [CLS] + pieces[:max_seq_length-2] + [SEP], padded with [PAD] to
    exactly `max_seq_length` (run_ner.py:785-847).  `n_pieces` is the
    pre-truncation piece count; `n_unk` counts [UNK] pieces kept."""
    pieces: list[str] = []
    for w in words:
        pieces.extend(encode_word(w, vocab))
    n_pieces = len(pieces)
    kept = pieces[: max_seq_length - 2]
    toks = [CLS] + kept + [SEP]
    unk_id = vocab[UNK]
    ids = [vocab.get(t, unk_id) for t in toks]
    n_unk = sum(1 for t in kept if t == UNK)
    mask = [1] * len(ids)
    pad = max_seq_length - len(ids)
    ids += [vocab[PAD]] * pad
    mask += [0] * pad
    seg = [0] * max_seq_length
    return ids, mask, seg, n_pieces, n_unk


def detokenize(
    pieces: list[str], labels: list[str] | None = None
) -> tuple[list[list[str]], list[list[str]]]:
    """Re-merge `##` pieces into words; split at [SEP]; drop
    [CLS]/[PAD].  Each merged word carries the label of its first
    piece (ops.py:479-510).  Returns (sentences, sentence_labels);
    labels is [] per sentence when `labels` is None."""
    sents: list[list[str]] = [[]]
    labs: list[list[str]] = [[]]
    for i, p in enumerate(pieces):
        if p == SEP:
            sents.append([])
            labs.append([])
            continue
        if p in (CLS, PAD):
            continue
        if p.startswith("##") and sents[-1]:
            sents[-1][-1] += p[2:]
            continue
        sents[-1].append(p[2:] if p.startswith("##") else p)
        if labels is not None:
            labs[-1].append(labels[i])
    keep = [k for k, s in enumerate(sents) if s]
    return [sents[k] for k in keep], [labs[k] for k in keep]
