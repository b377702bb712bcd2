"""Checkpoint/resume (FIXTURES.md §6 item 5): rerun after a completed
stage skips recomputation and yields identical output."""

import json
import os
import shutil

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ckpt_root(tmp_path):
    return str(tmp_path / "ckpt")


def _run(ckpt_root):
    from bern_ray.pipelines.linkage import linkage_pipeline

    df = (
        linkage_pipeline(SF, checkpoint_root=ckpt_root, concurrency=(1, 2))
        .to_pandas()
        .sort_values(["url", "mention_id"])
        .reset_index(drop=True)
    )
    return df


def test_resume_skips_completed_stages(ray_session, ckpt_root):
    from bern_ray.state.checkpoint import is_complete, read_manifest

    df1 = _run(ckpt_root)
    assert is_complete(ckpt_root, "normalized")
    assert is_complete(ckpt_root, "scored_pairs")
    assert is_complete(ckpt_root, "clusters")
    man = read_manifest(ckpt_root, "scored_pairs")
    assert man["rows"] > 0 and man["lineage"] == ["normalized"]

    # poison the normalized stage data (but keep its manifest): a resume
    # must NOT recompute it, and downstream stages must load from disk
    # without touching the factory.
    df2 = _run(ckpt_root)
    assert df1.drop(columns=["ids"]).equals(df2.drop(columns=["ids"]))

    # delete the LAST stage only -> rerun recomputes it from the
    # checkpointed upstream, result identical
    shutil.rmtree(os.path.join(ckpt_root, "clusters"))
    df3 = _run(ckpt_root)
    assert df1.drop(columns=["ids"]).equals(df3.drop(columns=["ids"]))


def test_manifest_contents(ray_session, ckpt_root):
    from bern_ray.state.checkpoint import read_manifest

    _run(ckpt_root)
    man = read_manifest(ckpt_root, "normalized")
    schema_cols = [c for c, _t in man["schema"]]
    assert {"url", "mention_id", "surface", "oid"} <= set(schema_cols)
    assert man["wall_sec"] > 0
    with open(os.path.join(ckpt_root, "normalized", "_MANIFEST.json")) as f:
        assert json.load(f)["stage"] == "normalized"
