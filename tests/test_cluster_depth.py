"""cluster_depth: planted near-dup chain (A~B~C~D with non-adjacent
jaccard below threshold) must report BFS eccentricity 3 from the
min-id root, while a planted near-clique reports 1."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_cluster_depth


def _jacc(a, b):
    sa = {
        " ".join(a[i : i + 3]) for i in range(len(a) - 2)
    }
    sb = {
        " ".join(b[i : i + 3]) for i in range(len(b) - 2)
    }
    return len(sa & sb) / len(sa | sb)


@pytest.mark.usefixtures("ray_session")
def test_chain_vs_clique(tmp_path):
    base = [f"tok{i}" for i in range(100)]
    chain = []
    for step in range(4):
        doc = list(base)
        # each step swaps ONE distinct far-apart token, so adjacent
        # docs share all but ~3 shingles and non-adjacent fall below
        for s in range(step):
            doc[10 + 20 * s] = f"mut{s}"
        chain.append(doc)
    # adjacency holds, transitivity fails — verify the planted design
    assert _jacc(chain[0], chain[1]) >= 0.9
    assert _jacc(chain[1], chain[2]) >= 0.9
    assert _jacc(chain[2], chain[3]) >= 0.9
    assert _jacc(chain[0], chain[2]) < 0.9
    assert _jacc(chain[1], chain[3]) < 0.9

    clique = [list(base[:50]) for _ in range(3)]  # identical triple
    other = [[f"z{i}x{j}" for i in range(40)] for j in range(3)]

    docs = chain + clique + other
    texts = [" ".join(d) for d in docs]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts), type=pa.string()),
            "source": pa.array(["s"] * len(texts), type=pa.string()),
            "n_chars": pa.array(
                [len(x) for x in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet", row_group_size=3)

    got = (
        q_cluster_depth(str(tmp_path))
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    # chain cluster rooted at doc 0: path 0-1-2-3 -> ecc 3
    assert got.loc[0, "n_nodes"] == 4
    assert got.loc[0, "ecc"] == 3
    # identical triple rooted at doc 4: clique -> ecc 1
    assert got.loc[4, "n_nodes"] == 3
    assert got.loc[4, "ecc"] == 1
