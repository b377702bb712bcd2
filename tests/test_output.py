"""Output projections: per-doc (begin, obj) sort + PubTator lines."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clusters(ray_session):
    from bern_ray.pipelines.linkage import linkage_pipeline

    return linkage_pipeline(SF, concurrency=(1, 2)).materialize()


def test_denotations_sorted_within_doc(clusters):
    from bern_ray.sources.output import to_denotations

    out = to_denotations(clusters).to_pandas()
    assert len(out) == clusters.to_pandas().url.nunique()
    checked = 0
    for r in out.itertuples():
        dens = list(r.denotations)
        keys = [(d["begin"], d["obj"]) for d in dens]
        assert keys == sorted(keys)
        assert r.n_denotations == len(dens)
        checked += len(dens)
    assert checked == clusters.count()


def test_pubtator_lines(clusters):
    from bern_ray.sources.output import to_pubtator

    out = to_pubtator(clusters).to_pandas()
    assert len(out) == clusters.count()
    line = out.line.iloc[0]
    parts = line.split("\t")
    assert len(parts) == 6
    assert parts[0].startswith("https://")
    assert "|" in parts[5] or parts[5].startswith("CUI-less") or parts[5]


def test_write_and_readback(clusters, tmp_path):
    import ray.data

    from bern_ray.sources.output import write_outputs

    write_outputs(clusters, str(tmp_path))
    back = ray.data.read_parquet(f"{tmp_path}/denotations")
    assert back.count() == clusters.to_pandas().url.nunique()
