"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The decode step is STUBBED (image/audio codecs are not available in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (shape + crc
style stats derived from the bytes) exercises the full Spark plumbing —
schema, partitioning, UDF signature, Arrow batch shape — which is the
part that matters for the engine.

At 100 TB scale the pattern is: keep binaries in their own column family
(parquet column chunk), project them only in the decode stage (column
pruning keeps scans cheap for metadata-only queries), and bound Arrow
batch bytes with spark.sql.execution.arrow.maxRecordsPerBatch so a batch
of large blobs fits executor memory.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, sample_rate int")


def synthesize_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    utf-8 bytes of the text (stands in for image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64(text_col), F.lit(1024)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64(text_col, F.lit(2)), F.lit(768)) + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
    )


def _autodetect_image_decoder():
    """Return a real ``payload -> HxWx3 uint8`` decoder when a codec
    library is importable, else None.  Checked once at first use so the
    same pipeline code activates real decoding on a cluster image that
    ships PIL or opencv (neither is present in this sandbox)."""
    try:
        from io import BytesIO

        from PIL import Image

        def _pil(payload: bytes) -> np.ndarray:
            return np.asarray(Image.open(BytesIO(payload)).convert("RGB"))

        return _pil
    except ImportError:
        pass
    try:
        import cv2

        def _cv2(payload: bytes) -> np.ndarray:
            img = cv2.imdecode(np.frombuffer(payload, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                raise ValueError("undecodable image payload")
            return img[:, :, ::-1]          # BGR -> RGB

        return _cv2
    except ImportError:
        return None


_UNSET = object()
_auto_decoder = _UNSET


def fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: 4x4x3 array derived from the
    payload bytes (crc-seeded).  Keeps the Spark plumbing — schema,
    batch shape, partitioning — fully exercised without codec libs."""
    crc = zlib.crc32(payload or b"")
    rng = (crc + np.arange(48, dtype=np.uint32) * 2654435761) % 256
    return rng.reshape(4, 4, 3).astype(np.uint8)


def decode_image(payload: bytes, fake: bool = False,
                 decoder=None) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    Decoder resolution order: explicit ``decoder`` callable >
    deterministic fake when ``fake=True`` (an explicit request for the
    test decoder must win even when a codec lib is installed — fake
    payloads are not valid image bytes) > auto-detected codec library
    (PIL/opencv) > NotImplementedError (this sandbox has no codec
    libs; the seam is how a real deployment plugs one in)."""
    global _auto_decoder
    if decoder is not None:
        return decoder(payload)
    if fake:
        return fake_decode_image(payload)
    if _auto_decoder is _UNSET:
        _auto_decoder = _autodetect_image_decoder()
    if _auto_decoder is not None:
        return _auto_decoder(payload)
    raise NotImplementedError(
        "image codecs unavailable in this environment; pass a decoder "
        "callable or fake=True for the deterministic test decoder")


def extract_media_features(df: DataFrame, fake: bool = True,
                           decoder=None) -> DataFrame:
    """Feature-extract stage: mapInPandas over (payload, metadata) ->
    per-item numeric features.  Runs the decoder batch-wise; pass
    ``decoder`` to plug a real codec through the seam.

    ``mean_intensity`` is an IMAGE feature: the image decoder runs only
    on ``kind == 'image'`` rows and audio/video rows carry NULL — a real
    codec plugged through the seam would otherwise crash on the first
    non-image payload (and in fake mode the number was meaningless).
    Byte-level stats (n_bytes, crc) and metadata aspect apply to every
    kind.  Video frame features live in :func:`extract_frame_features`.
    """
    schema = ("media_id long, kind string, n_bytes long, crc long, "
              "mean_intensity double, aspect double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n_bytes, crcs, means = [], [], []
            for p, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(p) if p is not None else b""
                n_bytes.append(len(b))
                crcs.append(zlib.crc32(b))
                if kind == "image":
                    img = decode_image(b, fake=fake, decoder=decoder)
                    means.append(float(img.mean()))
                else:
                    means.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "crc": crcs,
                "mean_intensity": means,
                "aspect": (pdf["width"].astype(float)
                           / pdf["height"].astype(float)),
            })

    cols = ["media_id", "kind", "payload", "width", "height"]
    return df.select(*cols).mapInPandas(run, schema=schema)


def resize_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — REAL (pure numpy index mapping), no
    codec dependency; works on any HxWxC array from the decode stage."""
    h0, w0 = img.shape[:2]
    rows = np.minimum((np.arange(height) * h0 // height), h0 - 1)
    cols = np.minimum((np.arange(width) * w0 // width), w0 - 1)
    return img[rows][:, cols]


def sample_frames(payload: bytes, n_frames: int, fake: bool = False,
                  frame_decoder=None) -> list[np.ndarray]:
    """Frame sampling for video payloads.

    ``frame_decoder`` is the seam for a real video codec: a callable
    ``(payload, n_frames) -> list[HxWx3 array]``.  Without one, the
    fake path splits the payload into ``n_frames`` byte windows, each
    decoded by the deterministic fake image decoder — the Spark-side
    contract (batch shape, per-frame fan-out, determinism) is real."""
    if frame_decoder is not None:
        return frame_decoder(payload, n_frames)
    if not fake:
        raise NotImplementedError(
            "video codecs unavailable in this environment; pass a "
            "frame_decoder callable or fake=True for the deterministic "
            "windowed decoder")
    b = payload or b""
    if n_frames <= 0:
        return []
    step = max(1, len(b) // n_frames)
    return [fake_decode_image(b[i * step:(i + 1) * step + 1])
            for i in range(n_frames)]


def extract_frame_features(df: DataFrame, n_frames: int = 4,
                           target: tuple = (2, 2),
                           fake: bool = True,
                           frame_decoder=None) -> DataFrame:
    """Video path: sample frames -> resize -> per-frame stats, exploded
    to one row per (media_id, frame_idx) — the shape a frame-level
    training pipeline consumes."""
    schema = ("media_id long, frame_idx int, mean_intensity double, "
              "resized_h int, resized_w int")
    th, tw = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, fidx, means, rh, rw = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames = sample_frames(
                    bytes(p) if p is not None else b"", n_frames,
                    fake=fake, frame_decoder=frame_decoder)
                for i, fr in enumerate(frames):
                    small = resize_image(fr, tw, th)
                    ids.append(mid)
                    fidx.append(i)
                    means.append(float(small.mean()))
                    rh.append(small.shape[0])
                    rw.append(small.shape[1])
            yield pd.DataFrame({
                "media_id": ids, "frame_idx": fidx,
                "mean_intensity": means, "resized_h": rh, "resized_w": rw})

    return (df.where(F.col("kind") == "video")
              .select("media_id", "payload")
              .mapInPandas(run, schema=schema))
