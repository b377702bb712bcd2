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


def test_contract_cc_auto_escalates_rounds(ray_session):
    """With a tiny final-solve budget, auto mode must run extra
    contraction rounds (forest-of-forest) and still produce labels
    identical to union-find."""
    import pyarrow as pa

    import ray.data

    from bern_ray.stages.cc import contract_cc, union_find_streaming

    rs = np.random.RandomState(7)
    n = 2000
    src = rs.randint(0, n, 3000)
    dst = src + rs.randint(1, 4, 3000)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )
    ).repartition(8)
    uf = union_find_streaming(ds)
    # budget far below the forest size forces rounds >= 2 automatically
    got = {}
    for b in contract_cc(
        ds, num_buckets=8, final_solve_max_rows=100, max_rounds=4
    ).iter_batches(batch_format="pyarrow"):
        got.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
    assert got == uf


def test_self_loops_out_of_contract_on_all_paths(ray_session):
    """A node whose only edge is a self-loop is absent from EVERY CC
    path's output (driver union-find and distributed contraction agree
    — cc.py _cc_arrays drops src == dst up front)."""
    from bern_ray.stages.cc import components, union_find_streaming

    ds = _edges_ds([(1, 2), (7, 7), (2, 3)])
    uf = union_find_streaming(ds)
    lp = {}
    from bern_ray.stages.cc import contract_cc

    for b in contract_cc(ds, num_buckets=4).iter_batches(
        batch_format="pyarrow"
    ):
        lp.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
    assert 7 not in uf and 7 not in lp
    assert _canon(uf) == _canon(lp)
