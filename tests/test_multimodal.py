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


def test_resize_kernel_nearest_exact():
    """Nearest-neighbour resize == direct index sampling."""
    from bern_ray.functions.multimodal import _resize_kernel

    rng = np.random.default_rng(7)
    h_in, w_in = 6, 9
    px = rng.integers(0, 256, h_in * w_in * 3, dtype=np.uint8)
    img = px.reshape(h_in, w_in, 3)
    out = _resize_kernel(px, w_in, h_in, 3, 2, "nearest").reshape(2, 3, 3)
    for r in range(2):
        for c in range(3):
            ri = min((r * h_in) // 2, h_in - 1)
            ci = min((c * w_in) // 3, w_in - 1)
            assert (out[r, c] == img[ri, ci]).all()


def test_resize_kernel_bilinear_vs_reference_loop():
    """Vectorized bilinear == a scalar reference loop (half-pixel
    centers, edge clamp)."""
    from bern_ray.functions.multimodal import _resize_kernel

    rng = np.random.default_rng(11)
    h_in, w_in, h, w = 5, 7, 8, 4
    px = rng.integers(0, 256, h_in * w_in * 3, dtype=np.uint8)
    img = px.reshape(h_in, w_in, 3).astype(np.float64)
    got = _resize_kernel(px, w_in, h_in, w, h, "bilinear").reshape(h, w, 3)
    for r in range(h):
        for c in range(w):
            ry = min(max((r + 0.5) * h_in / h - 0.5, 0), h_in - 1)
            rx = min(max((c + 0.5) * w_in / w - 0.5, 0), w_in - 1)
            y0, x0 = int(ry), int(rx)
            y1, x1 = min(y0 + 1, h_in - 1), min(x0 + 1, w_in - 1)
            fy, fx = ry - y0, rx - x0
            want = (
                img[y0, x0] * (1 - fy) * (1 - fx)
                + img[y0, x1] * (1 - fy) * fx
                + img[y1, x0] * fy * (1 - fx)
                + img[y1, x1] * fy * fx
            )
            assert (got[r, c] == np.clip(np.rint(want), 0, 255)).all()


def test_resize_upscale_identity_and_constant():
    """Identity resize returns the input; constant images stay
    constant under both methods at any output size."""
    from bern_ray.functions.multimodal import _resize_kernel

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, 4 * 6 * 3, dtype=np.uint8)
    for method in ("nearest", "bilinear"):
        assert (_resize_kernel(px, 6, 4, 6, 4, method) == px).all()
    flat = np.full(5 * 5 * 3, 77, dtype=np.uint8)
    for method in ("nearest", "bilinear"):
        out = _resize_kernel(flat, 5, 5, 9, 13, method)
        assert (out == 77).all()


def test_resize_images_stage(ray_session):
    """Actor-pool resize: image rows land at (w,h) and re-enter the
    decode seam; audio rows pass through byte-identical."""
    import ray.data

    from bern_ray.functions.multimodal import (
        _fake_decode,
        resize_images,
        synth_media,
    )

    docs = ray.data.read_parquet(f"{SF}/documents.parquet").limit(40)
    media = synth_media(docs)
    before = media.to_pandas().set_index("media_id")
    out = resize_images(media, 16, 12, concurrency=(1, 2)).to_pandas()
    assert len(out) == 40
    for _, r in out.iterrows():
        if r.kind == "image":
            assert (r.meta_w, r.meta_h) == (16, 12)
            w, h, px = _fake_decode(r.payload)
            assert (w, h, len(px)) == (16, 12, 16 * 12 * 3)
        else:
            assert r.payload == before.loc[r.media_id, "payload"]


def test_frame_sampler_and_composition(ray_session):
    """Video demux -> every-n-th frame as image rows; sampled frames
    compose straight into the resize stage."""
    import ray.data

    from bern_ray.functions.multimodal import (
        _fake_decode,
        _fake_demux,
        resize_images,
        sample_frames,
        synth_video,
    )

    docs = ray.data.read_parquet(f"{SF}/documents.parquet").limit(30)
    videos = synth_video(docs)
    raw = videos.to_pandas().set_index("media_id")
    frames = sample_frames(videos, 4, concurrency=(1, 2)).to_pandas()
    # per-video frame count and indices match the container header
    for mid, grp in frames.groupby("media_id"):
        w, h, all_frames = _fake_demux(raw.loc[mid, "payload"])
        want_idx = list(range(0, len(all_frames), 4))
        assert sorted(grp.frame_idx.tolist()) == want_idx
        row0 = grp[grp.frame_idx == 0].iloc[0]
        dw, dh, px = _fake_decode(row0.payload)
        assert (dw, dh) == (w, h)
        assert (px == all_frames[0]).all()
    # composition: sampled frames are valid input to the image resizer
    frames_ds = sample_frames(videos, 4, concurrency=(1, 2))
    resized = resize_images(frames_ds, 8, 8, concurrency=(1, 2)).to_pandas()
    assert len(resized) == len(frames)
    assert (resized.meta_w == 8).all() and (resized.meta_h == 8).all()


def test_frame_sampler_rejects_bad_every_n():
    from bern_ray.functions.multimodal import FrameSampler

    with pytest.raises(ValueError):
        FrameSampler(0)


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
