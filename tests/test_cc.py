"""Connected components: distributed label propagation == union-find."""

import numpy as np
import pytest


def _edges_ds(edges):
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], type=pa.int64()),
            "dst": pa.array([e[1] for e in edges], type=pa.int64()),
            "score": pa.array([1.0] * len(edges), type=pa.float64()),
        }
    )
    return ray.data.from_arrow(t)


def _canon(labels: dict) -> dict:
    """Normalize component labels to min-member for comparison."""
    groups = {}
    for node, lab in labels.items():
        groups.setdefault(lab, []).append(node)
    out = {}
    for members in groups.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


CASES = [
    [(1, 2), (2, 3), (10, 11)],
    [(5, 4), (3, 2), (4, 3), (100, 50), (50, 7)],
    # chain: pointer jumping must converge in O(log n) LP rounds
    [(i, i + 1) for i in range(12)],
]


@pytest.mark.parametrize("edges", CASES)
def test_lp_equals_union_find(ray_session, edges):
    from bern_ray.stages.cc import components, union_find_streaming

    ds = _edges_ds(edges)
    uf = _canon(union_find_streaming(ds))
    lp = _canon(components(ds, mode="lp"))
    assert uf == lp


def test_union_find_transitive(ray_session):
    from bern_ray.stages.cc import union_find_streaming

    ds = _edges_ds([(1, 2), (3, 4), (2, 3)])
    lab = _canon(union_find_streaming(ds))
    assert lab[1] == lab[4] == 1


def test_contract_cc_multiround_equals_union_find(ray_session):
    """contract_cc with rounds=2 (forest-of-forest path) must match
    union-find exactly."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from bern_ray.stages.cc import contract_cc, union_find_streaming

    rs = np.random.RandomState(3)
    n = 4000
    src = rs.randint(0, n, 6000)
    off = rs.randint(1, 5, 6000)
    dst = src + off  # chains + overlaps -> nontrivial components
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "score": pa.array(np.ones(len(src))),
            }
        )
    ).repartition(8)
    uf = union_find_streaming(ds)
    got = {}
    for b in contract_cc(ds, rounds=2, num_buckets=8).iter_batches(
        batch_format="pyarrow"
    ):
        got.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
    assert got == uf
