"""compaction_plan: hand-computed packing — shard sizes chosen so bin
boundaries land mid-source and a single oversized shard occupies a
bin span of its own."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import (
    COMPACT_SHARD_DOCS,
    COMPACT_TARGET_BYTES,
    q_compaction_plan,
)


@pytest.mark.usefixtures("ray_session")
def test_hand_packed_bins(tmp_path):
    # one doc per shard (doc_id multiples of COMPACT_SHARD_DOCS), two
    # sources; sizes in order (a,0)(a,1)(a,2)(b,0)(b,1):
    #   3000, 3000, 9000, 2000, 4000  with target 5000
    # exclusive cumsum // 5000 -> bins 0, 0, 1, 3, 3
    sizes = {
        ("a", 0): 3000,
        ("a", 1): 3000,
        ("a", 2): 9000,
        ("b", 0): 2000,
        ("b", 1): 4000,
    }
    rows = []
    for (src, shard), sz in sizes.items():
        rows.append((shard * COMPACT_SHARD_DOCS, "x" * 5, src, sz))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows), type=pa.string()),
            "source": pa.array([r[2] for r in rows], type=pa.string()),
            "n_chars": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet", row_group_size=2)

    assert COMPACT_TARGET_BYTES == 5000
    got = (
        q_compaction_plan(str(tmp_path))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert list(got["bin"]) == [0, 1, 3]
    assert list(got["n_files"]) == [2, 1, 2]
    assert list(got["total_bytes"]) == [6000, 9000, 6000]
    assert list(got["first_source"]) == ["a", "a", "b"]
    assert list(got["last_shard"]) == [1, 2, 1]
