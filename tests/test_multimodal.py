"""Multimodal plumbing: schema, actor stage, stub boundaries."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_media_schema_and_features(ray_session):
    import ray.data

    from bern_ray.functions.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        featurize_media,
        synth_media,
    )

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    media = synth_media(docs)
    assert media.schema().names == MEDIA_SCHEMA.names
    feats = featurize_media(media, concurrency=(1, 2)).to_pandas()
    assert len(feats) == 500
    assert {"media_id", "kind", "decoded_w", "decoded_h", "feature"} <= set(
        feats.columns
    )
    v = np.array(feats.feature.iloc[0])
    assert v.shape == (FEATURE_DIM,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # decoded dims equal the declared metadata dims
    raw = media.to_pandas()
    m = raw.set_index("media_id")
    for _, r in feats.head(20).iterrows():
        assert r.decoded_w == m.loc[r.media_id, "meta_w"]
        assert r.decoded_h == m.loc[r.media_id, "meta_h"]


def test_stub_boundaries_raise(ray_session):
    import ray.data

    from bern_ray.functions.multimodal import (
        resize_images,
        sample_frames,
        synth_media,
    )

    docs = ray.data.read_parquet(f"{SF}/documents.parquet").limit(10)
    media = synth_media(docs)
    with pytest.raises(NotImplementedError):
        resize_images(media, 32, 32)
    with pytest.raises(NotImplementedError):
        sample_frames(media, 5)


def test_featurizer_deterministic(ray_session):
    import ray.data

    from bern_ray.functions.multimodal import featurize_media, synth_media

    docs = ray.data.read_parquet(f"{SF}/documents.parquet").limit(50)
    a = (
        featurize_media(synth_media(docs), concurrency=(1, 2))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    b = (
        featurize_media(synth_media(docs), concurrency=(1, 2))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert a.media_id.tolist() == b.media_id.tolist()
    for x, y in zip(a.feature, b.feature):
        assert np.allclose(np.array(x), np.array(y))


def test_codec_provenance_both_branches(ray_session):
    """Outputs declare their decoder: the default branch (no PIL in
    this container) emits codec='fake-deterministic'; an injected real
    decoder flows through the same plumbing with codec='injected'."""
    import numpy as np
    import pyarrow as pa

    from bern_ray.functions.multimodal import (
        MediaFeaturizer,
        synth_media_batch,
    )

    batch = synth_media_batch(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["alpha beta", "gamma delta"]),
            }
        )
    )
    default = MediaFeaturizer()
    out = default(batch)
    assert set(out["codec"].to_pylist()) == {"fake-deterministic"}

    def real_decoder(payload: bytes):
        return 2, 2, np.arange(12, dtype=np.uint8)

    injected = MediaFeaturizer(decoder=real_decoder)
    out2 = injected(batch)
    assert set(out2["codec"].to_pylist()) == {"injected"}
    assert out2["decoded_w"].to_pylist() == [2, 2]
    # same schema from both branches
    assert out.schema.names == out2.schema.names
