"""heaps_curve: planted vocabulary growth — each document introduces
a known number of fresh tokens, so the curve is computable by hand;
checkpoint mass counts the exact token occurrences before the cut."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_heaps_curve


@pytest.mark.usefixtures("ray_session")
def test_planted_growth(tmp_path):
    # doc i contributes exactly one NEW token (w{i}) plus two old ones
    n = 50
    texts = [f"w{i} base common" for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
            "source": pa.array(["s"] * n, type=pa.string()),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet", row_group_size=7)

    got = (
        q_heaps_curve(str(tmp_path))
        .to_pandas()
        .sort_values("checkpoint")
        .reset_index(drop=True)
    )
    assert list(got["checkpoint"]) == [5 * (i + 1) for i in range(10)]
    # vocab at cut d: d fresh tokens + the 2 shared ones
    assert list(got["vocab"]) == [d + 2 for d in got["checkpoint"]]
    # mass at cut d: 3 tokens per doc
    assert list(got["n_tokens"]) == [3 * d for d in got["checkpoint"]]
