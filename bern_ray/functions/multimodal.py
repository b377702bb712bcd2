"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The task brief requires image/audio/video handling as actor-pool
map_batches stages with REAL Ray-side plumbing (schema, batch sizing,
actor signature, output layout) and STUBBED codecs, since no media
libraries exist in this container.

Schema convention for a media table:
    media_id:int64, kind:string('image'|'audio'), payload:binary,
    meta_w:int32, meta_h:int32, meta_sr:int32

- `synth_media` builds a deterministic media table from `documents`
  (payload = pseudo-pixel bytes derived from the text; header encodes
  w/h) so the plumbing is testable end-to-end.
- `MediaFeaturizer` is the actor-pool stage: tries to import a real
  codec (PIL / soundfile); when absent it falls back to the
  deterministic fake decoder `_fake_decode` (clearly marked). Output:
  fixed-width feature vector (byte histogram), decoded dims.
- `resize_images` (nearest/bilinear numpy kernel) and `sample_frames`
  (every-n-th frame -> image rows) are REAL vectorized stages: only
  the byte-level decode of real containers sits behind the per-actor
  codec seam (PIL/ffmpeg slot in there; the deterministic FAKE/FAKV
  containers cover this sandbox).

Batch sizing note (100 TB path): payloads are wide; callers should use
small `batch_size` (<=256) and rely on `target_max_block_size` so a
batch x concurrency fits worker heaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

FEATURE_DIM = 64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("meta_w", pa.int32()),
        ("meta_h", pa.int32()),
        ("meta_sr", pa.int32()),
    ]
)


def synth_media_batch(t: pa.Table) -> pa.Table:
    """documents batch -> deterministic fake media rows (testable)."""
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    payloads, kinds, ws, hs, srs = [], [], [], [], []
    for d, txt in zip(doc_ids, texts):
        kind = "image" if d % 2 == 0 else "audio"
        w = 8 + d % 24
        h = 8 + (d * 7) % 24
        sr = 8000 if kind == "audio" else 0
        seed_bytes = (txt or "x").encode("utf-8")
        reps = (w * h * 3) // max(len(seed_bytes), 1) + 1
        body = (seed_bytes * reps)[: w * h * 3]
        header = b"FAKE" + w.to_bytes(2, "big") + h.to_bytes(2, "big")
        payloads.append(header + body)
        kinds.append(kind)
        ws.append(w)
        hs.append(h)
        srs.append(sr)
    return pa.table(
        {
            "media_id": pa.array(doc_ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_w": pa.array(ws, type=pa.int32()),
            "meta_h": pa.array(hs, type=pa.int32()),
            "meta_sr": pa.array(srs, type=pa.int32()),
        }
    )


def synth_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(
        synth_media_batch, batch_format="pyarrow", batch_size=256
    )


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decoder (no media libs in this container): parses the FAKE
    header and returns (w, h, flat uint8 'pixels')."""
    if payload[:4] != b"FAKE":
        raise ValueError("unknown media container")
    w = int.from_bytes(payload[4:6], "big")
    h = int.from_bytes(payload[6:8], "big")
    return w, h, np.frombuffer(payload[8:], dtype=np.uint8)


class MediaFeaturizer:
    """Actor-pool stage: decode payload -> byte-histogram feature.

    The codec is resolved ONCE per actor in __init__ (the real-model
    seam: a GPU deployment swaps in its decoder/model here) and every
    output row declares its provenance in the `codec` column, so
    downstream consumers can tell real decodes from the deterministic
    fake used where no media library exists. A custom ``decoder``
    callable (payload -> (w, h, flat uint8)) may be injected — tests
    use this to exercise the real-codec branch without PIL.
    """

    def __init__(self, decoder=None):
        if decoder is not None:
            self.decode = decoder
            self.codec = "injected"
            return
        try:  # pragma: no cover - PIL not present in this container
            from PIL import Image  # noqa: F401

            self.decode = self._pil_decode
            self.codec = "pil"
        except ImportError:
            self.decode = _fake_decode
            self.codec = "fake-deterministic"

    @staticmethod
    def _pil_decode(payload: bytes):  # pragma: no cover - needs PIL
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(payload)).convert("RGB")
        w, h = im.size
        return w, h, np.asarray(im, dtype=np.uint8).ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ws, hs = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, px = self.decode(payload)
            hist = np.bincount(px >> 2, minlength=FEATURE_DIM)[:FEATURE_DIM]
            norm = np.linalg.norm(hist)
            feats.append(
                (hist / norm if norm else hist).astype(np.float32).tolist()
            )
            ws.append(w)
            hs.append(h)
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "decoded_w": pa.array(ws, type=pa.int32()),
                "decoded_h": pa.array(hs, type=pa.int32()),
                "feature": pa.array(
                    feats, type=pa.list_(pa.float32(), FEATURE_DIM)
                ),
                "codec": pa.array([self.codec] * n, type=pa.string()),
            }
        )


def featurize_media(
    media: "ray.data.Dataset", concurrency=(1, 4)
) -> "ray.data.Dataset":
    return media.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )


def _encode_fake(w: int, h: int, px: np.ndarray) -> bytes:
    """Serialize pixels back into the FAKE container so stage outputs
    re-enter any stage that decodes (featurize, resize again)."""
    return (
        b"FAKE"
        + int(w).to_bytes(2, "big")
        + int(h).to_bytes(2, "big")
        + px.astype(np.uint8).tobytes()
    )


def _resize_kernel(
    px: np.ndarray, w_in: int, h_in: int, w: int, h: int, method: str
) -> np.ndarray:
    """Vectorized RGB resize on a decoded flat uint8 buffer — pure
    numpy, codec-independent (the codec seam ends at decode).

    nearest: index sampling (exact, pytest vs hand-picked indices).
    bilinear: half-pixel-centered separable interpolation (the
    convention PIL/opencv use), pinned by a reference loop in tests."""
    img = px[: h_in * w_in * 3].reshape(h_in, w_in, 3).astype(np.float64)
    if method == "nearest":
        ri = np.minimum((np.arange(h) * h_in) // h, h_in - 1)
        ci = np.minimum((np.arange(w) * w_in) // w, w_in - 1)
        out = img[ri][:, ci]
        return out.astype(np.uint8).ravel()
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    ry = np.clip((np.arange(h) + 0.5) * h_in / h - 0.5, 0, h_in - 1)
    rx = np.clip((np.arange(w) + 0.5) * w_in / w - 0.5, 0, w_in - 1)
    y0 = np.floor(ry).astype(np.int64)
    x0 = np.floor(rx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h_in - 1)
    x1 = np.minimum(x0 + 1, w_in - 1)
    fy = (ry - y0)[:, None, None]
    fx = (rx - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8).ravel()


class ImageResizer:
    """Actor-pool stage: decode -> numpy resize -> re-encoded payload.

    Decode goes through the same per-actor codec seam as
    MediaFeaturizer (PIL when present, injectable, deterministic fake
    otherwise); the resize itself is real vectorized numpy either way,
    so this stage is NOT a stub — only the byte-level decode of real
    image formats is. Non-image rows are passed through untouched so
    the stage composes in mixed-media pipelines."""

    def __init__(self, w: int, h: int, method: str = "bilinear", decoder=None):
        self.w, self.h, self.method = w, h, method
        if decoder is not None:
            self.decode = decoder
            self.codec = "injected"
        else:
            try:  # pragma: no cover - PIL not present in this container
                from PIL import Image  # noqa: F401

                self.decode = MediaFeaturizer._pil_decode
                self.codec = "pil"
            except ImportError:
                self.decode = _fake_decode
                self.codec = "fake-deterministic"

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_payloads, ws, hs = [], [], []
        for kind, payload in zip(kinds, payloads):
            if kind != "image":
                out_payloads.append(payload)
                ws.append(-1)
                hs.append(-1)
                continue
            w_in, h_in, px = self.decode(payload)
            resized = _resize_kernel(
                px, w_in, h_in, self.w, self.h, self.method
            )
            out_payloads.append(_encode_fake(self.w, self.h, resized))
            ws.append(self.w)
            hs.append(self.h)
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out_payloads, type=pa.binary()),
                "meta_w": pa.array(ws, type=pa.int32()),
                "meta_h": pa.array(hs, type=pa.int32()),
                "codec": pa.array([self.codec] * n, type=pa.string()),
            }
        )


def resize_images(
    media: "ray.data.Dataset",
    w: int,
    h: int,
    method: str = "bilinear",
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Resize every image row to (w, h); audio/video rows pass through.

    Actor pool with small batches: payloads are wide, so batch x
    concurrency must fit a worker heap (brief's memory-aware rule)."""
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"w": w, "h": h, "method": method},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )


# Video container (deterministic, like FAKE for images):
#   b"FAKV" + n_frames(2) + w(2) + h(2) + n*w*h*3 raw RGB bytes.
def synth_video_batch(t: pa.Table) -> pa.Table:
    """documents batch -> deterministic fake video rows."""
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    rows = {"media_id": [], "kind": [], "payload": [], "meta_w": [],
            "meta_h": [], "meta_sr": []}
    for d, txt in zip(doc_ids, texts):
        w = 4 + d % 8
        h = 4 + (d * 3) % 8
        n_frames = 3 + d % 10
        seed = (txt or "x").encode("utf-8")
        frame_len = w * h * 3
        reps = frame_len // max(len(seed), 1) + 1
        frames = b"".join(
            bytes((b + i) & 0xFF for b in (seed * reps)[:frame_len])
            for i in range(n_frames)
        )
        header = (
            b"FAKV"
            + n_frames.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + h.to_bytes(2, "big")
        )
        rows["media_id"].append(d)
        rows["kind"].append("video")
        rows["payload"].append(header + frames)
        rows["meta_w"].append(w)
        rows["meta_h"].append(h)
        rows["meta_sr"].append(0)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "payload": pa.array(rows["payload"], type=pa.binary()),
            "meta_w": pa.array(rows["meta_w"], type=pa.int32()),
            "meta_h": pa.array(rows["meta_h"], type=pa.int32()),
            "meta_sr": pa.array(rows["meta_sr"], type=pa.int32()),
        }
    )


def synth_video(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(
        synth_video_batch, batch_format="pyarrow", batch_size=256
    )


def _fake_demux(payload: bytes):
    """STUB demuxer (no ffmpeg in this container): parse the FAKV
    container into (w, h, [flat uint8 frame, ...])."""
    if payload[:4] != b"FAKV":
        raise ValueError("unknown video container")
    n = int.from_bytes(payload[4:6], "big")
    w = int.from_bytes(payload[6:8], "big")
    h = int.from_bytes(payload[8:10], "big")
    body = np.frombuffer(payload[10:], dtype=np.uint8)
    fl = w * h * 3
    return w, h, [body[i * fl : (i + 1) * fl] for i in range(n)]


class FrameSampler:
    """Actor-pool stage: demux video -> every-n-th frame as an IMAGE
    row (FAKE container), so sampled frames feed straight into
    ImageResizer / MediaFeaturizer. The demuxer is the per-actor codec
    seam (ffmpeg would slot in here); frame selection and re-encode
    are real."""

    def __init__(self, every_n: int, demuxer=None):
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n
        if demuxer is not None:
            self.demux = demuxer
            self.codec = "injected"
        else:
            self.demux = _fake_demux
            self.codec = "fake-deterministic"

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, payloads, ws, hs = [], [], [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            w, h, frames = self.demux(payload)
            for i in range(0, len(frames), self.every_n):
                mids.append(mid)
                fidx.append(i)
                payloads.append(_encode_fake(w, h, frames[i]))
                ws.append(w)
                hs.append(h)
        return pa.table(
            {
                "media_id": pa.array(mids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int64()),
                "kind": pa.array(["image"] * len(mids), type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "meta_w": pa.array(ws, type=pa.int32()),
                "meta_h": pa.array(hs, type=pa.int32()),
                "codec": pa.array([self.codec] * len(mids), type=pa.string()),
            }
        )


def sample_frames(
    media: "ray.data.Dataset", every_n: int, concurrency=(1, 4)
) -> "ray.data.Dataset":
    """Every n-th frame of each video row, emitted as image rows
    (one row per sampled frame — a flat_map-shaped batch transform)."""
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
