"""Term-frequency adjustments (functions/fellegi_tf.py).

Layers: a scalar-reference rendering of the Splink/Winkler adjustment
formula over the shared EM fixture; monotonicity (rarer value ->
strictly larger adjusted weight); and the distributed end-to-end path
(value counts + pattern counts + table) against a driver-side
recomputation on a corpus small enough to enumerate.
"""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from bern_ray.functions.fellegi_tf import (
    fs_tf_adjustments,
    fs_tf_sql,
    fs_tf_table,
)
from tests.test_fellegi import FIXTURE, _counts_table, _scalar_em


def _vc_table(pairs):
    return pa.table(
        {
            "value": pa.array([v for v, _ in pairs], type=pa.string()),
            "n": pa.array([n for _, n in pairs], type=pa.int64()),
        }
    )


NATION_COUNTS = [("0", 50), ("1", 30), ("2", 15), ("3", 5)]
SEGMENT_COUNTS = [("AUTO", 70), ("HOUSE", 30)]


def test_tf_table_matches_scalar_reference():
    got = fs_tf_table(
        _counts_table(FIXTURE),
        {
            "nation": _vc_table(NATION_COUNTS),
            "segment": _vc_table(SEGMENT_COUNTS),
        },
    ).to_pylist()
    lam, m, u = _scalar_em(FIXTURE)
    pos = {"nation": 1, "segment": 2}
    counts = {"nation": NATION_COUNTS, "segment": SEGMENT_COUNTS}
    assert len(got) == len(NATION_COUNTS) + len(SEGMENT_COUNTS)
    for r in got:
        f = r["field"]
        total = sum(n for _, n in counts[f])
        n = dict(counts[f])[r["value"]]
        tf = n / total
        base = math.log2(m[pos[f]] / u[pos[f]])
        adj = math.log2(u[pos[f]] / tf)
        assert r["tf"] == pytest.approx(tf, abs=5e-7)
        assert r["base_weight"] == pytest.approx(base, abs=5e-7)
        assert r["tf_adj"] == pytest.approx(adj, abs=5e-7)
        assert r["adj_weight"] == pytest.approx(base + adj, abs=5e-7)


def test_rarer_value_gets_strictly_larger_weight():
    got = fs_tf_table(
        _counts_table(FIXTURE),
        {"nation": _vc_table(NATION_COUNTS)},
    ).to_pylist()
    by_n = sorted(got, key=lambda r: dict(NATION_COUNTS)[r["value"]])
    ws = [r["adj_weight"] for r in by_n]
    assert ws == sorted(ws, reverse=True)
    assert len(set(ws)) == len(ws)
    # base_weight is the same field-level constant on every row
    assert len({r["base_weight"] for r in got}) == 1


def test_distributed_path_matches_driver_recompute(ray_session):
    import ray.data

    from bern_ray.functions.fellegi import fs_pattern_counts
    from bern_ray.functions.fellegi_tf import _value_counts

    corpus_rows = [
        {"c_nationkey": i % 4, "c_mktsegment": ["AUTO", "HOUSE"][i % 2]}
        for i in range(60)
    ]
    corpus = ray.data.from_items(corpus_rows)

    # distributed value counts == Counter
    vc = {
        r["value"]: r["n"]
        for r in _value_counts(corpus, "c_nationkey").take_all()
    }
    ref = Counter(str(r["c_nationkey"]) for r in corpus_rows)
    assert vc == dict(ref)

    left = ray.data.from_items(
        [
            {
                "l_id": i,
                "l_name": f"Customer#{i:09d}",
                "l_nation": i % 4,
                "l_segment": ["AUTO", "HOUSE"][i % 2],
            }
            for i in range(40)
        ]
    )
    right = ray.data.from_items(
        [
            {
                "r_id": i,
                "r_name": f"Customer#{i:09d}"
                if i % 4
                else f"Xustomer#{i:09d}",
                "r_nation": i % 4 if i % 5 else (i + 1) % 4,
                "r_segment": ["AUTO", "HOUSE"][i % 2]
                if i % 7
                else "OTHER",
            }
            for i in range(40)
        ]
    )

    def block(names):
        return [int(n[-1]) for n in names]

    patterns = fs_pattern_counts(
        left, right, block_fn=block, jw_threshold=0.96
    )
    got = fs_tf_adjustments(
        patterns,
        corpus,
        fields={"nation": "c_nationkey", "segment": "c_mktsegment"},
    ).to_pylist()

    # driver recompute from the same collected pieces
    from bern_ray.functions.fellegi import _collect_counts

    patterns2 = fs_pattern_counts(
        left, right, block_fn=block, jw_threshold=0.96
    )
    counts = _collect_counts(patterns2)
    nat = Counter(str(r["c_nationkey"]) for r in corpus_rows)
    seg = Counter(r["c_mktsegment"] for r in corpus_rows)
    want = fs_tf_table(
        counts,
        {
            "nation": _vc_table(sorted(nat.items())),
            "segment": _vc_table(sorted(seg.items())),
        },
    ).to_pylist()
    assert got == want


def test_tf_sql_shape():
    sql = fs_tf_sql(
        "SELECT 1 AS g_name, 1 AS g_nation, 1 AS g_segment",
        {
            "nation": ("SELECT 'x' AS value, 1 AS n", 2),
            "segment": ("SELECT 'y' AS value, 1 AS n", 3),
        },
    )
    assert "tf_nation AS MATERIALIZED" in sql
    assert "tf_segment AS MATERIALIZED" in sql
    assert sql.count("UNION ALL") == 1
    assert "ORDER BY field, value" in sql
    assert "m2 / i.u2" in sql and "m3 / i.u3" in sql
