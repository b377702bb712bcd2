"""compression_stats: planted texts — repetitive boilerplate
compresses far below prose-like variety; values equal a direct zlib
call; empty text yields ratio 1.0 by convention."""

import zlib

import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.textstats import compression_stats


@pytest.mark.usefixtures("ray_session")
def test_planted_ratios():
    rep = "buy now click here " * 200
    varied = " ".join(f"w{i}x{i * 7 % 97}" for i in range(600))
    texts = [rep, varied, ""]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = (
        compression_stats(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
    )
    for i, s in enumerate(texts):
        b = s.encode()
        assert out.loc[i, "n_bytes"] == len(b)
        if b:
            assert out.loc[i, "n_compressed"] == len(zlib.compress(b, 6))
            assert out.loc[i, "ratio"] == pytest.approx(
                round(len(zlib.compress(b, 6)) / len(b), 6)
            )
    assert out.loc[2, "ratio"] == 1.0
    # the quality signal itself: boilerplate << varied text
    assert out.loc[0, "ratio"] < out.loc[1, "ratio"] / 3
