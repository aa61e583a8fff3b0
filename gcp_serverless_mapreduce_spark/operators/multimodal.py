"""Multimodal column plumbing — image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched pandas stages.

The container ships no media codecs (PIL/librosa/ffmpeg), so the *decode*
step is stubbed: ``decode_media`` tries the real libraries and otherwise
falls back to a clearly-marked deterministic fake (byte-level stats).
Everything around the stub — schema, ``mapInPandas`` batch shape,
partitioning, metadata struct — is the real plumbing a media pipeline
needs and is fully tested; swapping the fake for a real decoder changes
one function body.

Scale design: payloads stay opaque bytes end-to-end (no driver collect,
no base64 round-trips); per-batch work is vectorized numpy over Arrow
buffers; feature extraction is a map-only stage — zero shuffles until the
feature aggregation, which shuffles only (id, small-struct) rows, never
payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

FRAME_BYTES = 32       # fake "frame" stride for video payloads
FRAME_SAMPLE_EVERY = 4  # keep every 4th frame

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "mean_byte double, min_byte long, max_byte long"
)

FRAMES_SCHEMA = "media_id long, frame_idx long, frame_len long, frame_md5 string"

RESIZED_SCHEMA = (
    "media_id long, orig_w long, orig_h long, new_w long, new_h long, "
    "scale_ppm long"
)


def media_table(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: the text
    payload stands in for encoded bytes; metadata is synthesized from
    doc_id.  (media_id, media_type, payload binary, width, height)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(t) for t in MEDIA_TYPES]),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 7 * 160 + 320).alias("width"),
        (F.col("doc_id") % 5 * 90 + 180).alias("height"),
    )


def _decode_bytes(payload: bytes) -> dict:
    """THE STUB.  A real pipeline decodes here (PIL.Image.open /
    soundfile.read / av.open); none of those libs exist in this container,
    so emit deterministic byte-level stats with the same output shape."""
    try:  # pragma: no cover - codec libs absent by design
        import PIL.Image  # noqa: F401
        raise NotImplementedError(
            "real image decode not wired up; container has no test images")
    except ImportError:
        pass
    if not payload:
        return {"n_bytes": 0, "mean_byte": None, "min_byte": None,
                "max_byte": None}
    import numpy as np
    arr = np.frombuffer(payload, dtype=np.uint8)
    return {"n_bytes": int(arr.size), "mean_byte": float(arr.mean()),
            "min_byte": int(arr.min()), "max_byte": int(arr.max())}


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract: mapInPandas over the payload
    column.  Map-only — no shuffle; output drops the payload so anything
    downstream shuffles small rows."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pd.DataFrame([_decode_bytes(p) for p in pdf["payload"]])
            feats.insert(0, "media_id", pdf["media_id"].values)
            feats.insert(1, "media_type", pdf["media_type"].values)
            yield feats

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling for video payloads: split bytes into FRAME_BYTES
    chunks, keep every FRAME_SAMPLE_EVERY-th, fingerprint each (md5).
    Pandas stage so a real demuxer drops in; one output row per frame."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame_len": [],
                   "frame_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
                    frame = payload[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return (media.filter(F.col("media_type") == "video")
            .mapInPandas(batches, schema=FRAMES_SCHEMA))


def resize_images(media: DataFrame, target_w: int = 224) -> DataFrame:
    """Resize stub for image payloads: computes the real geometry
    (aspect-preserving target dims + scale in parts-per-million); the pixel
    resample is where PIL would run and is faked as metadata-only.  All
    geometry is exact integer arithmetic — float rounding rules (numpy
    half-even vs SQL half-away) never enter."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "orig_w": pdf["width"],
                "orig_h": pdf["height"],
                "new_w": target_w,
                "new_h": pdf["height"] * target_w // pdf["width"],
                "scale_ppm": target_w * 1_000_000 // pdf["width"],
            })

    return (media.filter(F.col("media_type") == "image")
            .mapInPandas(batches, schema=RESIZED_SCHEMA))
