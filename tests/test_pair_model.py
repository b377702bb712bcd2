"""Model seam, evidenced with a REAL weight file: the trained logistic
pair model (bern_ray/resources/pair_model.npz, written by
scripts/train_pair_model.py) loads once per scorer actor and its edge
decisions — and therefore the flagship clusters — are identical to the
frozen ensemble's on the fixture corpus."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_checkpoint_exists_and_loads():
    from bern_ray.stages.scoring import (
        PAIR_FEATURES,
        LogisticPairModel,
        default_pair_model_path,
    )

    m = LogisticPairModel(default_pair_model_path())
    assert len(m.w) == len(PAIR_FEATURES)
    # probabilities, batched
    F = np.zeros((4, len(PAIR_FEATURES)))
    F[1, 3] = 1.0  # same_oid
    F[2, 4] = 1.0  # fold twin, sim 0
    F[3, :3] = 1.0
    F[3, 4] = 1.0  # fold twin, sim 1
    p = m(F)
    assert p.shape == (4,)
    assert p[1] >= 0.5 and p[3] >= 0.5  # dictionary hit / strong twin
    assert p[0] < 0.5 and p[2] < 0.5  # no agreement / weak twin


def test_model_decisions_match_ensemble(ray_session):
    """Every scored pair on the fixture corpus gets the same is_edge
    decision from the loaded model as from the frozen ensemble."""
    from bern_ray.pipelines.linkage import (
        extract_normalize_mentions,
        score_pairs,
    )
    from bern_ray.sources.pages import read_pages
    from bern_ray.stages.blocking import candidate_pairs
    from bern_ray.stages.scoring import (
        default_pair_model_path,
        load_pair_model,
    )

    normalized = extract_normalize_mentions(
        read_pages(SF), concurrency=(1, 4)
    ).materialize()

    def run(loader):
        out = score_pairs(
            candidate_pairs(normalized, dedup=False, with_attrs=False),
            normalized,
            concurrency=(1, 4),
            dedup_in_attach=True,
            pair_model_loader=loader,
        ).to_pandas()
        return out.sort_values(["a_mid", "b_mid"]).reset_index(drop=True)

    ens = run(None)
    mod = run(load_pair_model(default_pair_model_path()))
    assert len(ens) == len(mod) and len(ens) > 1000
    assert (ens.a_mid.to_numpy() == mod.a_mid.to_numpy()).all()
    assert (ens.is_edge.to_numpy() == mod.is_edge.to_numpy()).all()


def test_model_clusters_identical(ray_session):
    """linkage_pipeline(pair_model_path=...) produces byte-identical
    cluster assignments to the default ensemble run."""
    import pandas as pd

    from bern_ray.pipelines.linkage import linkage_pipeline
    from bern_ray.stages.scoring import default_pair_model_path

    def run(**kw):
        df = linkage_pipeline(SF, concurrency=(1, 4), **kw).to_pandas()
        return df.sort_values(["url", "mention_id"]).reset_index(drop=True)

    base = run()
    model = run(pair_model_path=default_pair_model_path())
    pd.testing.assert_frame_equal(base, model)


def test_model_flip_preserves_normalized_checkpoint(
    ray_session, tmp_path
):
    """Switching pair_model_path invalidates the scored_pairs and
    clusters checkpoints (scoring changed) but NOT the normalized
    checkpoint (extraction didn't) — the content-key scoping in
    linkage_pipeline."""
    import json
    import os

    from bern_ray.pipelines.linkage import linkage_pipeline
    from bern_ray.stages.scoring import default_pair_model_path

    root = str(tmp_path / "ckpt")
    linkage_pipeline(SF, checkpoint_root=root, concurrency=(1, 4)).count()

    def manifest(name):
        with open(os.path.join(root, name, "_MANIFEST.json")) as f:
            return json.load(f)

    norm_key = manifest("normalized")["content_key"]
    scored_key = manifest("scored_pairs")["content_key"]
    norm_mtime = os.path.getmtime(
        os.path.join(root, "normalized", "_MANIFEST.json")
    )
    linkage_pipeline(
        SF,
        checkpoint_root=root,
        concurrency=(1, 4),
        pair_model_path=default_pair_model_path(),
    ).count()
    # normalized untouched (same key, manifest not rewritten)
    assert manifest("normalized")["content_key"] == norm_key
    assert (
        os.path.getmtime(
            os.path.join(root, "normalized", "_MANIFEST.json")
        )
        == norm_mtime
    )
    # scoring stage recomputed under a new content key
    assert manifest("scored_pairs")["content_key"] != scored_key
