"""Pure-kernel tests for repetition_batch (no Ray session needed)."""

import pyarrow as pa

from bern_ray.functions.textstats import repetition_batch


def _run(texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return repetition_batch(t).to_pydict()


def test_known_values():
    out = _run(["a a a", "x y z w", "b c b c b"])
    # "a a a": bigrams {aa:2} -> top 2/2; all 3 tokens duplicated
    assert out["top_bigram_frac"][0] == 1.0
    assert out["dup_word_frac"][0] == 1.0
    # all-unique doc: no repeats anywhere
    assert out["top_bigram_frac"][1] == round(1 / 3, 6)  # 3 unique bigrams
    assert out["dup_word_frac"][1] == 0.0
    # "b c b c b": bigrams bc,cb,bc,cb -> top 2/4; every token repeats
    assert out["top_bigram_frac"][2] == 0.5
    assert out["dup_word_frac"][2] == 1.0


def test_single_token_doc_is_zero_not_crash():
    out = _run(["solo", "a b a"])
    assert out["top_bigram_frac"][0] == 0.0
    assert out["dup_word_frac"][0] == 0.0
    assert out["dup_word_frac"][1] == round(2 / 3, 6)


def test_empty_batch():
    out = _run([])
    assert out["doc_id"] == []
