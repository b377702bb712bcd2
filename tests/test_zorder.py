"""zorder_layout: the Morton interleave kernel vs a scalar bit-walk
reference, NTILE closed-form vs exhaustive assignment, and the layout
property itself — per-tile envelopes bound BOTH columns far tighter
than the global range."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import (
    ZORDER_BITS,
    ZORDER_TILES,
    q_zorder_layout,
)


def _scalar_z(x, y):
    z = 0
    for i in range(ZORDER_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@pytest.mark.usefixtures("ray_session")
def test_zorder_tiles_and_envelopes(tmp_path):
    rng = np.random.RandomState(7)
    n = 4096
    part = rng.randint(0, 1 << 12, size=n).astype(np.int64)
    supp = rng.randint(0, 1 << 12, size=n).astype(np.int64)
    t = pa.table(
        {
            "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "l_linenumber": pa.array(
                (np.arange(n, dtype=np.int64) % 7) + 1
            ),
            "l_partkey": pa.array(part),
            "l_suppkey": pa.array(supp),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet", row_group_size=512)

    out = (
        q_zorder_layout(str(tmp_path))
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    assert len(out) == ZORDER_TILES
    assert out["n"].sum() == n
    # equal-count tiles: sizes differ by at most 1
    assert out["n"].max() - out["n"].min() <= 1

    # scalar reference: sort by (z, orderkey, linenumber), slice tiles
    zs = np.array(
        [_scalar_z(int(p), int(s)) for p, s in zip(part, supp)]
    )
    order = np.lexsort((np.arange(n) % 7 + 1, np.arange(n), zs))
    q, m = divmod(n, ZORDER_TILES)
    sizes = [q + 1 if i < m else q for i in range(ZORDER_TILES)]
    pos = 0
    for tile, sz in enumerate(sizes):
        seg = order[pos : pos + sz]
        pos += sz
        row = out.iloc[tile]
        assert row["n"] == sz
        assert row["p_lo"] == part[seg].min()
        assert row["p_hi"] == part[seg].max()
        assert row["s_lo"] == supp[seg].min()
        assert row["s_hi"] == supp[seg].max()

    # the point of the curve: mean per-tile envelope AREA is a small
    # fraction of the global area (both columns prune, not just one)
    area = (out["p_hi"] - out["p_lo"]) * (out["s_hi"] - out["s_lo"])
    global_area = (part.max() - part.min()) * (supp.max() - supp.min())
    assert area.mean() < global_area / 8
