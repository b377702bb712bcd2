"""Suffix-array blocking: the zero-copy suffix-explosion kernel vs a
per-row Python reference, the end-to-end pair semantics vs a naive
set-based computation, and the purge counter."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.suffixblock import (
    _explode_suffixes,
    suffix_blocking,
)


def _ref_suffixes(strings, min_len):
    out = []
    for i, s in enumerate(strings):
        s = s or ""
        for k in range(0, max(len(s) - min_len + 1, 0)):
            out.append((i, s[k:]))
    return out


@pytest.mark.parametrize("min_len", [1, 3, 5])
def test_explode_matches_reference(min_len):
    strings = [
        "cold widget",
        "",
        "abc",
        "x" * 12,
        None,
        "sliced string tail",
    ]
    arr = pa.array(strings, type=pa.string())
    # exercise the offset-slice path too
    for a in (arr, arr.slice(1, 4), pa.chunked_array([arr, arr])):
        parent, sufs = _explode_suffixes(a, min_len)
        if isinstance(a, pa.ChunkedArray):
            vals = a.combine_chunks().to_pylist()
        else:
            vals = a.to_pylist()
        want = _ref_suffixes(vals, min_len)
        got = list(zip(parent.tolist(), sufs.to_pylist()))
        assert got == want


def test_pairs_match_naive(ray_session):
    rng = np.random.default_rng(5)
    nouns = ["widget", "rod", "bolt", "nut"]
    adjs = ["cold", "small", "large", "blue", "red"]
    names = [
        f"{adjs[a]} {nouns[n]}"
        for a, n in zip(
            rng.integers(0, len(adjs), 40),
            rng.integers(0, len(nouns), 40),
        )
    ]
    ids = list(range(100, 140))
    min_len, max_block = 4, 12

    # naive reference: global suffix census, purge, distinct pairs
    from collections import defaultdict

    blocks = defaultdict(set)
    for i, nm in zip(ids, names):
        for k in range(0, max(len(nm) - min_len + 1, 0)):
            blocks[nm[k:]].add(i)
    want = defaultdict(int)
    for members in blocks.values():
        if 2 <= len(members) <= max_block:
            ms = sorted(members)
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    want[(ms[x], ms[y])] += 1

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "name": pa.array(names, type=pa.string()),
            }
        )
    ).repartition(3)
    df = suffix_blocking(
        ds, "id", "name", min_len=min_len, max_block=max_block
    ).to_pandas()
    got = {
        (int(a), int(b)): int(n)
        for a, b, n in zip(df.id_a, df.id_b, df.n_shared)
    }
    assert got == dict(want)


def test_purge_counter(ray_session):
    from bern_ray.state import counters

    counters.reset()
    # 30 identical names, max_block=8: every shared-suffix block has
    # 30 members -> all purged, zero pairs, counters fire
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(range(30)), type=pa.int64()),
                "name": pa.array(["same name"] * 30),
            }
        )
    )
    df = suffix_blocking(
        ds, "id", "name", min_len=4, max_block=8
    ).to_pandas()
    assert len(df) == 0
    snap = counters.snapshot()
    assert snap.get("suffixblock_purged_blocks", 0) >= 1
    assert snap.get("suffixblock_purged_pairs", 0) >= 30 * 29 // 2
