"""bm25_topk: Ray two-pass scatter-gather BM25 vs a scalar reference
implementation on a planted corpus (tf variation, length variation,
absent-term docs), including the per-batch top-k merge across many
small blocks."""

import math
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import (
    BM25_B,
    BM25_K1,
    BM25_QUERY,
    BM25_TOPK,
    q_bm25_topk,
)


def _scalar_bm25(texts):
    toks = [re.findall("[0-9a-zA-Z]+", t.lower()) for t in texts]
    n = float(len(texts))
    avgdl = sum(len(tk) for tk in toks) / n
    dfs = {
        q: float(sum(1 for tk in toks if q in tk)) for q in BM25_QUERY
    }
    out = []
    for i, tk in enumerate(toks):
        s = 0.0
        for q in sorted(BM25_QUERY):
            df = dfs[q]
            if df == 0:
                continue
            tf = float(tk.count(q))
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += (
                idf
                * tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(tk) / avgdl))
            )
        if s > 0.0:
            out.append((i, round(s, 6)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:BM25_TOPK]


@pytest.mark.usefixtures("ray_session")
def test_bm25_matches_scalar_reference(tmp_path):
    texts = []
    for i in range(40):
        words = ["filler"] * (i % 7)
        if i % 2 == 0:
            words += ["hash"] * (1 + i % 3)
        if i % 3 == 0:
            words += ["join", "scan"]
        if i % 5 == 0:
            words += ["stream", "stream", "window"]
        words += ["pad"] * (i % 11)
        texts.append(" ".join(words) if words else "empty doc")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts), type=pa.string()),
            "source": pa.array(["t"] * len(texts), type=pa.string()),
            "n_chars": pa.array(
                [len(x) for x in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet", row_group_size=5)

    got = q_bm25_topk(str(tmp_path)).to_pandas()
    want = _scalar_bm25(texts)
    assert list(zip(got["doc_id"], got["bm25"])) == [
        (d, pytest.approx(s, abs=1e-6)) for d, s in want
    ]
    # ranking is score-desc with doc_id tie-break
    assert list(got["bm25"]) == sorted(got["bm25"], reverse=True)
