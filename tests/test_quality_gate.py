"""corpus_quality_gate composition semantics: heuristic reasons pass
through unchanged, the LM cut applies only to heuristic-keepers, and
the threshold equals the hand-computed p10 cumulative rule over the
lm_score table."""

from math import ceil

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(ray_session):
    from bern_ray.functions.textstats import lm_score
    from bern_ray.pipelines.relational import (
        _docs,
        q_corpus_quality_gate,
        q_quality_filter,
    )

    gate = q_corpus_quality_gate(SF).to_pandas().set_index("doc_id")
    heur = q_quality_filter(SF).to_pandas().set_index("doc_id")
    lm = lm_score(_docs(SF)).to_pandas().set_index("doc_id")
    return gate, heur, lm


def test_heuristic_reasons_pass_through(frames):
    gate, heur, _ = frames
    bad = heur[heur.reason != "keep"]
    assert (gate.loc[bad.index, "reason"] == bad.reason).all()


def test_lm_cut_matches_manual_threshold(frames):
    from bern_ray.pipelines.relational import QG_LM_QUANTILE

    gate, heur, lm = frames
    units = np.rint(lm["avg_logprob"].to_numpy() * 1e6).astype(np.int64)
    uk, uc = np.unique(units, return_counts=True)
    thr = uk[np.searchsorted(np.cumsum(uc), ceil(QG_LM_QUANTILE * len(lm)))]
    keepers = heur[heur.reason == "keep"].index
    lm_units = dict(zip(lm.index, units))
    for d in keepers:
        expected = "lm" if lm_units[d] < thr else "keep"
        assert gate.loc[d, "reason"] == expected
    # and keep == (reason == 'keep') everywhere
    assert (gate["keep"] == (gate["reason"] == "keep")).all()


def test_lm_cut_fires(frames):
    gate, _, _ = frames
    # p10 of a 500-doc corpus must actually reject some docs
    assert (gate["reason"] == "lm").sum() > 0
