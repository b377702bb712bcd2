"""Unigram-LM quality score: broadcast and joined paths must be
identical (the joined path is the 100-TB shape — nothing
vocabulary-sized on the driver), and the score must equal the
hand-computed sum of corpus-frequency log-probs."""

import math

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bern_ray.functions.textstats import lm_score


def _corpus():
    docs = [
        "aa aa bb",
        "aa cc",
        "bb bb cc dd",
        "rare tokens here only once each",
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
        return (
            lm_score(ds, mode=mode)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run("broadcast"), run("joined"))


@pytest.mark.usefixtures("ray_session")
def test_hand_computed_logprobs():
    t = _corpus()
    out = (
        lm_score(ray.data.from_arrow(t), mode="broadcast")
        .to_pandas()
        .set_index("doc_id")
    )
    # corpus counts: aa=3 bb=3 cc=2 dd=1, 6 hapax -> N=15
    n = 15.0
    doc0 = (2 * math.log(3 / n) + math.log(3 / n)) / 3
    assert out.loc[0, "n_tokens"] == 3
    assert abs(out.loc[0, "avg_logprob"] - round(doc0, 6)) < 1e-9
    # doc 3: six hapax tokens, each ln(1/15)
    assert out.loc[3, "n_tokens"] == 6
    assert abs(out.loc[3, "avg_logprob"] - round(math.log(1 / n), 6)) < 1e-9
    # rare-token doc scores strictly lower than common-token docs
    assert out.loc[3, "avg_logprob"] < out.loc[0, "avg_logprob"]
