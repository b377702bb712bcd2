"""Distributed WordPiece featurization (SURVEY.md §2.2 M8-M9).

Ray-side wrapper over the pure kernels in `core/wordpiece.py`:

1. `build_corpus_vocab` — distributed word counts (partial combine in
   `map_batches`, tiny `groupby().sum()`, driver collects only the
   top-`vocab_size` rows — O(vocab), never O(corpus)).
2. `wordpiece_features` — the vocab is `ray.put` ONCE and handed to an
   actor-pool featurizer via its constructor (`put_broadcast` /
   `get_broadcast`, deserialized at most once per worker); each doc is
   pre-chunked into 30-word windows (run_ner.py:157-190) and each
   window becomes one fixed-width feature row: `input_ids` /
   `input_mask` as Arrow `fixed_size_list<int32>[max_seq_length]` —
   the layout the reference's estimator consumes
   (run_ner.py:785-847).

The feature rows are the tensor-feed contract for a real model behind
the scorer seam (`stages/scoring.py model_loader`); no model runs in
this sandbox, so verification is pytest ground truth
(tests/test_wordpiece.py: greedy-match cases, round-trip through
`detokenize`, truncation/padding invariants) plus the driver's
rows-only check on the `wordpiece_features` query.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from bern_ray.core.wordpiece import (
    build_vocab,
    chunk_words,
    featurize,
)
from bern_ray.stages.broadcast import get_broadcast, put_broadcast

_WORD_RE = r"[0-9a-z]+"


def build_corpus_vocab(
    docs: "ray.data.Dataset",
    vocab_size: int = 8192,
    text_col: str = "text",
) -> dict[str, int]:
    """Corpus-derived deterministic vocab: distributed lowercase word
    counts, driver sees only the top rows (count desc, word asc)."""
    word_re = re.compile(_WORD_RE)

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in pc.utf8_lower(t[text_col]).to_pylist():
            if s is not None:
                c.update(word_re.findall(s))
        toks = list(c.keys())
        return pa.table(
            {
                "word": pa.array(toks, type=pa.string()),
                "partial": pa.array(
                    [c[w] for w in toks], type=pa.int64()
                ),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("partial")
        .sort(["sum(partial)", "word"], descending=[True, False])
        .limit(vocab_size)
        .take_all()
    )
    return build_vocab(
        {r["word"]: r["sum(partial)"] for r in counts}, vocab_size
    )


class WordPieceFeaturizer:
    """Actor-pool stage: vocab deserialized once per worker in
    __init__, greedy encode + fixed-width framing per batch."""

    def __init__(
        self,
        vocab_ref,
        max_seq_length: int = 128,
        window: int = 30,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.vocab = get_broadcast(vocab_ref)
        self.max_seq_length = max_seq_length
        self.window = window
        self.text_col = text_col
        self.id_col = id_col
        self.word_re = re.compile(_WORD_RE)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_col, mask_col = [], []
        doc_ids, chunk_idx, n_pieces_col, n_unk_col = [], [], [], []
        texts = pc.utf8_lower(t[self.text_col]).to_pylist()
        keys = t[self.id_col].to_pylist()
        for key, text in zip(keys, texts):
            words = self.word_re.findall(text) if text else []
            for ci, chunk in enumerate(chunk_words(words, self.window)):
                ids, mask, _seg, n_pieces, n_unk = featurize(
                    chunk, self.vocab, self.max_seq_length
                )
                doc_ids.append(key)
                chunk_idx.append(ci)
                ids_col.append(ids)
                mask_col.append(mask)
                n_pieces_col.append(n_pieces)
                n_unk_col.append(n_unk)
        fixed = pa.list_(pa.int32(), self.max_seq_length)
        return pa.table(
            {
                self.id_col: pa.array(doc_ids, type=pa.int64()),
                "chunk_idx": pa.array(chunk_idx, type=pa.int32()),
                "input_ids": pa.array(ids_col, type=fixed),
                "input_mask": pa.array(mask_col, type=fixed),
                "n_pieces": pa.array(n_pieces_col, type=pa.int32()),
                "n_unk": pa.array(n_unk_col, type=pa.int32()),
            }
        )


def wordpiece_features(
    docs: "ray.data.Dataset",
    vocab_size: int = 8192,
    max_seq_length: int = 128,
    window: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Docs -> one fixed-width WordPiece feature row per 30-word
    window (M8).  Two passes over the text column only: one for the
    vocab counts, one for the encode."""
    vocab = build_corpus_vocab(docs, vocab_size, text_col)
    vocab_ref = put_broadcast(vocab)
    return docs.map_batches(
        WordPieceFeaturizer,
        fn_constructor_kwargs={
            "vocab_ref": vocab_ref,
            "max_seq_length": max_seq_length,
            "window": window,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
