"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

Image decode is REAL for PNG / BMP / PPM via the built-in pure-numpy
decoder (no codec library needed; see ``numpy_image_decoder``); PIL or
opencv, when present on the cluster image, take precedence through the
same seam and add JPEG/WebP/etc.  Video/audio codecs are not available
in this container, so frame decode stays behind a pluggable seam with a
deterministic fake default (``sample_frames``); the Spark plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested either way.

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
    """Return a real ``payload -> HxWx3 uint8`` decoder.  Preference
    order: PIL > opencv (full codec coverage when the cluster image
    ships one) > the built-in pure-numpy decoder below (PNG / BMP /
    PPM — no third-party codec needed).  Checked once at first use."""
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
        return numpy_image_decoder


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy BMP decode (Windows BITMAPINFOHEADER family, 24/32-bit
    uncompressed BI_RGB) -> HxWx3 uint8 RGB.  Fully vectorized: one
    frombuffer + stride reshape; handles 4-byte row padding, bottom-up
    (positive height) and top-down (negative height) pixel order."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP core header (size {hdr_size})")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={comp}); only "
            f"24/32-bit BI_RGB decodes without a codec library")
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    top_down = h < 0
    h = abs(h)
    nchan = bpp // 8
    stride = (w * nchan + 3) & ~3          # rows padded to 4 bytes
    need = pix_off + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = np.frombuffer(payload, np.uint8, count=stride * h,
                         offset=pix_off).reshape(h, stride)
    img = rows[:, :w * nchan].reshape(h, w, nchan)[:, :, :3][:, :, ::-1]
    return np.ascontiguousarray(img if top_down else img[::-1])


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy binary PPM (P6, maxval <= 255) decode -> HxWx3 uint8.
    Header tokens may be separated by any whitespace and ``#`` comments
    per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize header: 3 ints after the magic, skipping comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if not (0 < maxval <= 255) or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (w={w} h={h} maxval={maxval})")
    pos += 1                               # single whitespace after maxval
    need = w * h * 3
    if len(payload) - pos < need:
        raise ValueError(f"truncated PPM: {len(payload)-pos} < {need}")
    return np.frombuffer(payload, np.uint8, count=need,
                         offset=pos).reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Pure numpy+stdlib PNG decode (8-bit, non-interlaced; gray / RGB /
    palette / gray-alpha / RGBA) -> HxWx3 uint8 RGB (alpha dropped, as
    PIL's convert("RGB") does).  zlib inflates the IDAT stream; scanline
    filters (None/Sub/Up/Average/Paeth) are reversed per the PNG spec —
    Sub via a vectorized per-channel cumulative sum, Average/Paeth with
    the spec's sequential recurrence."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln                      # length + type + data + crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ct, _comp, _filt, interlace = ihdr[8:13]
    if depth != 8 or interlace != 0 or ct not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ct}, "
            f"interlace={interlace}); only 8-bit non-interlaced decodes "
            f"without a codec library")
    nchan = _PNG_CHANNELS[ct]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * nchan
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    raw = raw[:h * (stride + 1)].reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            r = row
        elif f == 1:                        # Sub: cumsum per channel lane
            r = row.reshape(w, nchan).cumsum(axis=0).reshape(stride) & 0xFF
        elif f == 2:                        # Up
            r = (row + prev) & 0xFF
        elif f in (3, 4):                   # Average / Paeth: sequential
            r = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = int(r[x - nchan]) if x >= nchan else 0
                b = int(prev[x])
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - nchan]) if x >= nchan else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        (b if pb <= pc else c)
                r[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        recon[y] = r
        prev = r
    px = recon.astype(np.uint8).reshape(h, w, nchan)
    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[px[:, :, 0]]
    if nchan == 1:
        return np.repeat(px, 3, axis=2)
    if nchan == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def numpy_image_decoder(payload: bytes) -> np.ndarray:
    """The no-dependency REAL decoder behind the codec seam: sniffs the
    magic bytes and decodes PNG / BMP / PPM(P6) with numpy + stdlib
    zlib alone.  Other formats (JPEG etc.) still need a codec library
    plugged through the seam."""
    b = bytes(payload or b"")
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:2] == b"P6":
        return decode_ppm(b)
    raise ValueError(
        f"unrecognized image payload (magic {b[:4]!r}); the built-in "
        f"numpy decoder handles PNG/BMP/PPM — install PIL or opencv, or "
        f"pass a decoder callable, for other formats")


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
    (PIL/opencv) > the built-in pure-numpy PNG/BMP/PPM decoder (always
    available; raises ValueError for formats that genuinely need a
    codec library)."""
    global _auto_decoder
    if decoder is not None:
        return decoder(payload)
    if fake:
        return fake_decode_image(payload)
    if _auto_decoder is _UNSET:
        _auto_decoder = _autodetect_image_decoder()
    return _auto_decoder(payload)


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
