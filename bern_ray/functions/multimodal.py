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
- `resize_images` / `sample_frames` raise NotImplementedError when no
  real codec is present — the documented stub boundary — but validate
  schema and batch flow first so the pipeline shape is exercised.

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


def resize_images(media: "ray.data.Dataset", w: int, h: int):
    """NOT IMPLEMENTED: real image resize needs PIL/opencv (absent).

    The schema/batch contract is validated before raising so tests can
    pin the plumbing.
    """
    schema = media.schema()
    missing = [n for n in ("media_id", "payload") if n not in schema.names]
    if missing:
        raise ValueError(f"media table missing columns: {missing}")
    raise NotImplementedError(
        "image resize requires a real codec (PIL/opencv) — not available "
        "in this container; plumbing validated up to this point"
    )


def sample_frames(media: "ray.data.Dataset", every_n: int):
    """NOT IMPLEMENTED: video frame sampling needs ffmpeg (absent)."""
    schema = media.schema()
    if "payload" not in schema.names:
        raise ValueError("media table missing payload column")
    raise NotImplementedError(
        "frame sampling requires ffmpeg — not available in this container"
    )
