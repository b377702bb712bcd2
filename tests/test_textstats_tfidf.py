"""tfidf_top_terms two-path equivalence: the driver-broadcast df path
and the fully distributed df-attach (bucket_join on token hash +
bucketed per-doc top-n) must produce identical rows — the joined path
is the 100-TB shape (nothing vocabulary-sized on the driver)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.textstats import tfidf_top_terms


def _corpus():
    # tf ties everywhere (every token tf=1 in most docs) so the
    # (tf desc, df asc, term asc) tie-break is actually exercised;
    # include a repeated-token doc for the tf>1 branch
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox sleeps",
        "lorem ipsum dolor sit amet",
        "lorem lorem lorem unique ipsum",
        "alpha beta gamma delta",
        "alpha beta gamma epsilon zeta",
        "zeta eta theta iota kappa",
        "one two three four five six seven",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_joined_equals_broadcast():
    t = _corpus()

    def run(mode):
        ds = ray.data.from_arrow(t).repartition(3)
        out = tfidf_top_terms(ds, top_n=3, mode=mode).to_pandas()
        return out.sort_values(["doc_id", "term"]).reset_index(drop=True)

    b = run("broadcast")
    j = run("joined")
    pd.testing.assert_frame_equal(b, j)
    # every doc contributed exactly top_n rows (all docs have >= 3 terms)
    assert (b.groupby("doc_id").size() == 3).all()
