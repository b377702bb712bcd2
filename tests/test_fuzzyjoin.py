"""fuzzy_join semantics on a constructed corpus: blocking recall trade
is explicit (cross-block pairs are never compared), threshold filters
within-block candidates, and the JW column equals the pinned kernel."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from bern_ray.core.similarity import jaro_winkler
from bern_ray.functions.fuzzyjoin import fuzzy_join, suffix_digits_block


def test_suffix_digits_block():
    # key equality <=> string equality of the raw k-char tail (the SQL
    # oracle's substr(name, -3) predicate): same tail -> same key,
    # different tails -> different keys, INCLUDING non-digit tails
    out = suffix_digits_block(
        ["Item#000123", "x123", "nodigits", "abcxyz", "morexyz", ""]
    )
    assert out[0] == out[1]  # both tails "123"
    assert out[3] == out[4]  # both tails "xyz"
    # non-digit tails do NOT collapse into one block
    assert out[2] != out[3] and out[2] != out[5] and out[3] != out[5]
    # a digit tail never collides with a non-digit tail
    assert out[0] not in (out[2], out[3], out[5])


@pytest.fixture(scope="module")
def joined(ray_session):
    left = ray.data.from_arrow(
        pa.table(
            {
                "l_id": pa.array([1, 2, 3], type=pa.int64()),
                "l_name": pa.array(
                    ["Widget#001", "Widget#002", "Gadget#777"]
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "r_id": pa.array([10, 20, 30], type=pa.int64()),
                "r_name": pa.array(
                    # typo of Widget#001 (same block 001); exact
                    # Gadget#777; a block-777 stranger
                    ["Widgot#001", "Gadget#777", "Zzzzzz#777"]
                ),
            }
        )
    )
    return fuzzy_join(
        left, right, block_fn=suffix_digits_block, threshold=0.9
    ).to_pandas()


def test_matches_and_threshold(joined):
    got = {(r.l_id, r.r_id) for r in joined.itertuples()}
    # typo match + exact match; the block-777 stranger scores < 0.9;
    # Widget#002 has no same-block candidate at all
    assert got == {(1, 10), (3, 20)}


def test_jw_column_is_the_pinned_kernel(joined):
    row = joined[(joined.l_id == 1) & (joined.r_id == 10)].iloc[0]
    expect = jaro_winkler(["Widget#001"], ["Widgot#001"])[0]
    assert abs(row.jw - round(expect, 6)) < 1e-9


def test_cross_block_pairs_never_compared(joined):
    # Gadget#777 vs Widget#001 is similar-ish but different block —
    # must be absent regardless of threshold
    assert not ((joined.l_id == 3) & (joined.r_id == 10)).any()


def test_split_tokens_matches_sql_split():
    import pyarrow as pa

    from bern_ray.functions.fuzzyjoin import _split_tokens

    names = ["cold widget", "a", "", "x  y", None, "one two three"]
    parent, pos, toks = _split_tokens(pa.array(names))
    # reference: SQL string_split(nm, ' ') with 1-based ordinality
    want = []
    for i, nm in enumerate(names):
        for j, tok in enumerate((nm or "").split(" ")):
            want.append((i, j + 1, tok))
    got = list(zip(parent.tolist(), pos.tolist(), toks.to_pylist()))
    assert got == want


def test_monge_elkan_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from bern_ray.core.similarity import jaro_winkler
    from bern_ray.functions.fuzzyjoin import monge_elkan_join

    left_rows = [
        (1, "cold widget"),
        (2, "small widget"),
        (3, "blue rod"),
        (4, "one two three"),  # 3 tokens: mean over 3 occurrences
        (5, "dup dup"),  # duplicate left token: counted twice
    ]
    right_rows = [
        (11, "widget c0ld"),  # reorder + substitution of (1)
        (12, "rod blue"),  # pure reorder of (3)
        (13, "three one zwo"),  # shares 2 tokens with (4)
        (14, "dup"),  # single token
        (15, "nomatch xyz"),  # shares no token: never a candidate
    ]
    th = 0.5

    def brute():
        out = {}
        for lid, ln in left_rows:
            lt = ln.split(" ")
            for rid, rn in right_rows:
                rt = rn.split(" ")
                if not set(lt) & set(rt):
                    continue
                me = float(
                    np.mean(
                        [
                            max(
                                jaro_winkler([a], [b])[0]
                                for b in rt
                            )
                            for a in lt
                        ]
                    )
                )
                if me >= th:
                    out[(lid, rid)] = round(me, 6)
        return out

    left = ray.data.from_arrow(
        pa.table(
            {
                "l_id": pa.array(
                    [r[0] for r in left_rows], type=pa.int64()
                ),
                "l_name": pa.array([r[1] for r in left_rows]),
            }
        )
    ).repartition(2)
    right = ray.data.from_arrow(
        pa.table(
            {
                "r_id": pa.array(
                    [r[0] for r in right_rows], type=pa.int64()
                ),
                "r_name": pa.array([r[1] for r in right_rows]),
            }
        )
    ).repartition(2)
    df = monge_elkan_join(left, right, threshold=th).to_pandas()
    got = {
        (int(a), int(b)): float(m)
        for a, b, m in zip(df.l_id, df.r_id, df.me)
    }
    want = brute()
    assert got == want
    # reorder robustness: the pure-reorder pair scores exactly 1.0
    assert got[(3, 12)] == 1.0
    # no-shared-token pairs are never emitted (blocking semantics)
    assert all(b != 15 for (_, b) in got)


def test_one_to_one_match_mutual_best(ray_session):
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.fuzzyjoin import one_to_one_match

    # l=1: best r=11 (0.9); r=11: best l=1 -> mutual
    # l=2: best r=11 (0.8) but r=11 prefers l=1 -> dropped
    # l=3 / r=12: tie 0.7 with r=13; tie-break ascending -> r=12;
    #             r=12's best l=3 -> mutual
    # l=4 / r=14: only candidates of each other -> mutual
    rows = [
        (1, 11, 0.9),
        (2, 11, 0.8),
        (1, 12, 0.6),
        (3, 12, 0.7),
        (3, 13, 0.7),
        (4, 14, 0.55),
    ]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "l_id": pa.array(
                    [r[0] for r in rows], type=pa.int64()
                ),
                "r_id": pa.array(
                    [r[1] for r in rows], type=pa.int64()
                ),
                "me": pa.array(
                    [r[2] for r in rows], type=pa.float64()
                ),
            }
        )
    ).repartition(3)
    df = one_to_one_match(pairs).to_pandas()
    got = {
        (int(a), int(b)): float(s)
        for a, b, s in zip(df.l_id, df.r_id, df.me)
    }
    assert got == {(1, 11): 0.9, (3, 12): 0.7, (4, 14): 0.55}
    # 1:1 by construction
    assert df.l_id.is_unique and df.r_id.is_unique


def test_soft_tfidf_matches_bruteforce(ray_session):
    import math

    import pyarrow as pa

    import ray.data

    from bern_ray.core.similarity import jaro_winkler
    from bern_ray.functions.fuzzyjoin import soft_tfidf_join

    left_rows = [
        (1, "cold widget"),
        (2, "small widget"),
        (3, "cold widget"),  # duplicate name: df counts ids
        (4, "blue rod"),
    ]
    right_rows = [
        (11, "widget c0ld"),  # close-but-unequal + reorder
        (12, "rod blue"),
        (13, "widget zz"),  # unseen token zz: smoothed idf
    ]
    theta, th = 0.8, 0.1

    def brute():
        n = len(left_rows)
        df = {}
        for _, nm in left_rows:
            for tok in set(nm.split(" ")):
                df[tok] = df.get(tok, 0) + 1

        def idf(tok):
            return math.log((1 + n) / (1 + df.get(tok, 0)))

        out = {}
        for lid, ln in left_rows:
            lt = ln.split(" ")
            lnorm = math.sqrt(sum(idf(a) ** 2 for a in lt))
            for rid, rn in right_rows:
                rt = rn.split(" ")
                if not set(lt) & set(rt):
                    continue
                rnorm = math.sqrt(sum(idf(b) ** 2 for b in rt))
                s = 0.0
                for a in lt:
                    jws = [
                        float(jaro_winkler([a], [b])[0]) for b in rt
                    ]
                    jmax = max(jws)
                    if jmax < theta:
                        continue
                    wb = max(
                        idf(b)
                        for b, j in zip(rt, jws)
                        if j == jmax
                    )
                    s += idf(a) / lnorm * wb / rnorm * jmax
                if s >= th:
                    out[(lid, rid)] = round(s, 6)
        return out

    left = ray.data.from_arrow(
        pa.table(
            {
                "l_id": pa.array(
                    [r[0] for r in left_rows], type=pa.int64()
                ),
                "l_name": pa.array([r[1] for r in left_rows]),
            }
        )
    ).repartition(2)
    right = ray.data.from_arrow(
        pa.table(
            {
                "r_id": pa.array(
                    [r[0] for r in right_rows], type=pa.int64()
                ),
                "r_name": pa.array([r[1] for r in right_rows]),
            }
        )
    ).repartition(2)
    df = soft_tfidf_join(
        left, right, theta=theta, threshold=th
    ).to_pandas()
    got = {
        (int(a), int(b)): float(s)
        for a, b, s in zip(df.l_id, df.r_id, df.soft_tfidf)
    }
    assert got == brute()
    assert len(got) > 0
    # identical-token-set reorder pair scores ~1.0 (cosine of self)
    assert abs(got[(4, 12)] - 1.0) < 1e-6


def test_topk_matches(ray_session):
    import pyarrow as pa

    import ray.data

    from bern_ray.functions.fuzzyjoin import topk_matches

    rows = [
        (1, 11, 0.9),
        (1, 12, 0.8),
        (1, 13, 0.8),  # tie with 12: rank by ascending r_id
        (1, 14, 0.7),  # rank 4 -> dropped at k=3
        (2, 11, 0.5),  # fewer than k candidates: all kept
    ]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "l_id": pa.array(
                    [r[0] for r in rows], type=pa.int64()
                ),
                "r_id": pa.array(
                    [r[1] for r in rows], type=pa.int64()
                ),
                "me": pa.array(
                    [r[2] for r in rows], type=pa.float64()
                ),
            }
        )
    ).repartition(2)
    df = (
        topk_matches(pairs, 3)
        .to_pandas()
        .sort_values(["l_id", "rk"])
        .reset_index(drop=True)
    )
    got = list(
        zip(df.l_id, df.r_id, df.me, df.rk)
    )
    assert got == [
        (1, 11, 0.9, 1),
        (1, 12, 0.8, 2),
        (1, 13, 0.8, 3),
        (2, 11, 0.5, 1),
    ]
