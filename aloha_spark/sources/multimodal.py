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


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    STUB: real decoding needs PIL/opencv (absent here).  ``fake=True``
    returns a deterministic 4x4x3 array derived from the bytes."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic test decoder")
    crc = zlib.crc32(payload or b"")
    rng = (crc + np.arange(48, dtype=np.uint32) * 2654435761) % 256
    return rng.reshape(4, 4, 3).astype(np.uint8)


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract stage: mapInPandas over (payload, metadata) ->
    per-item numeric features.  Runs the (stub) decoder batch-wise."""
    schema = ("media_id long, kind string, n_bytes long, crc long, "
              "mean_intensity double, aspect double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n_bytes, crcs, means = [], [], []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                n_bytes.append(len(b))
                crcs.append(zlib.crc32(b))
                img = decode_image(b, fake=fake)
                means.append(float(img.mean()))
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
