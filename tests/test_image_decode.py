"""Pure-numpy image decoders (PNG / BMP / PPM) behind the multimodal
codec seam: golden decodes of hand-built byte payloads, all five PNG
scanline filters, padding/orientation variants, and the end-to-end
Spark path with real (non-fake) decoding."""

import struct
import zlib

import numpy as np
import pytest

from aloha_spark.sources import multimodal as M

# a fixed 3x2 RGB test image (rows top-down)
IMG32 = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                  [[255, 255, 255], [0, 0, 0], [128, 64, 32]]],
                 dtype=np.uint8)


# ---------------------------------------------------------------------------
# hand-built encoders (test-local; the repo ships only decoders)

def encode_bmp(img: np.ndarray, bpp: int = 24,
               top_down: bool = False) -> bytes:
    h, w = img.shape[:2]
    nchan = bpp // 8
    stride = (w * nchan + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            row += bytes([b, g, r] + ([0] if nchan == 4 else []))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pix = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                      1, bpp, 0, len(pix), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return hdr + dib + pix


def encode_ppm(img: np.ndarray, comment: bool = False) -> bytes:
    h, w = img.shape[:2]
    head = b"P6\n"
    if comment:
        head += b"# a netpbm comment\n"
    head += f"{w} {h}\n255\n".encode()
    return head + img.tobytes()


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(img: np.ndarray, filters=None, color_type: int = 2) -> bytes:
    """Minimal PNG encoder with per-row filter CHOICE so every filter
    type's reverse path is exercised by the decoder."""
    h, w = img.shape[:2]
    nchan = {0: 1, 2: 3, 6: 4}[color_type]
    px = img.reshape(h, w * nchan).astype(np.int32)
    filters = filters or [0] * h
    out = bytearray()
    prev = np.zeros(w * nchan, dtype=np.int32)
    for y in range(h):
        f, row = filters[y], px[y]
        if f == 0:
            filt = row
        elif f == 1:
            left = np.concatenate([np.zeros(nchan, np.int32),
                                   row[:-nchan]])
            filt = (row - left) & 0xFF
        elif f == 2:
            filt = (row - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(nchan, np.int32),
                                   row[:-nchan]])
            filt = (row - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            filt = np.empty_like(row)
            for x in range(len(row)):
                a = int(row[x - nchan]) if x >= nchan else 0
                b = int(prev[x])
                c = int(prev[x - nchan]) if x >= nchan else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
                filt[x] = (int(row[x]) - pred) & 0xFF
        out += bytes([f]) + bytes(filt.astype(np.uint8))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (M._PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------------

class TestBmp:
    def test_golden_24bit_bottom_up(self):
        got = M.decode_bmp(encode_bmp(IMG32, bpp=24))
        assert got.dtype == np.uint8 and np.array_equal(got, IMG32)

    def test_golden_32bit_top_down(self):
        got = M.decode_bmp(encode_bmp(IMG32, bpp=32, top_down=True))
        assert np.array_equal(got, IMG32)

    def test_row_padding_odd_width(self):
        # width 3 at 24bpp -> 9-byte rows padded to 12; padding must
        # not bleed into pixels
        img = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(5, 3, 3)
        assert np.array_equal(M.decode_bmp(encode_bmp(img)), img)

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError, match="not a BMP"):
            M.decode_bmp(b"JUNKJUNKJUNK" * 10)
        bad = bytearray(encode_bmp(IMG32))
        bad[30] = 1                        # compression = BI_RLE8
        with pytest.raises(ValueError, match="unsupported BMP"):
            M.decode_bmp(bytes(bad))
        with pytest.raises(ValueError, match="truncated"):
            M.decode_bmp(encode_bmp(IMG32)[:-4])


class TestPpm:
    def test_golden(self):
        assert np.array_equal(M.decode_ppm(encode_ppm(IMG32)), IMG32)

    def test_header_comment(self):
        assert np.array_equal(
            M.decode_ppm(encode_ppm(IMG32, comment=True)), IMG32)

    def test_rejects(self):
        with pytest.raises(ValueError, match="not a P6"):
            M.decode_ppm(b"P3\n1 1\n255\n1 2 3")
        with pytest.raises(ValueError, match="truncated PPM:"):
            M.decode_ppm(encode_ppm(IMG32)[:-2])


class TestPng:
    def test_golden_all_filters(self):
        # 6 rows so every filter type (0,1,2,3,4 and a repeat) runs
        img = (np.arange(6 * 4 * 3, dtype=np.uint32) * 37 % 256) \
            .astype(np.uint8).reshape(6, 4, 3)
        payload = encode_png(img, filters=[0, 1, 2, 3, 4, 2])
        assert np.array_equal(M.decode_png(payload), img)

    def test_grayscale_to_rgb(self):
        g = np.array([[0, 128], [255, 7]], dtype=np.uint8)[:, :, None]
        got = M.decode_png(encode_png(g, color_type=0))
        assert got.shape == (2, 2, 3)
        assert np.array_equal(got[:, :, 0], g[:, :, 0])
        assert np.array_equal(got[:, :, 1], g[:, :, 0])

    def test_rgba_drops_alpha(self):
        rgba = np.dstack([IMG32, np.full((2, 3), 200, np.uint8)])
        got = M.decode_png(encode_png(rgba, color_type=6))
        assert np.array_equal(got, IMG32)

    def test_reference_1x1_red(self):
        png = bytes.fromhex(
            "89504e470d0a1a0a0000000d4948445200000001000000010802000000"
            "907753de0000000c49444154789c63f8cfc0000003010100c9fe92ef"
            "0000000049454e44ae426082")
        got = M.decode_png(png)
        assert got.shape == (1, 1, 3)
        assert np.array_equal(got[0, 0], [255, 0, 0])

    def test_rejects_16bit(self):
        img = IMG32
        payload = bytearray(encode_png(img))
        # corrupt bit depth field inside IHDR (offset 8+8+8)
        payload[24] = 16
        with pytest.raises(ValueError):
            M.decode_png(bytes(payload))


class TestSeam:
    def test_sniffer_dispatch(self):
        assert np.array_equal(M.numpy_image_decoder(encode_bmp(IMG32)),
                              IMG32)
        assert np.array_equal(M.numpy_image_decoder(encode_ppm(IMG32)),
                              IMG32)
        assert np.array_equal(M.numpy_image_decoder(encode_png(IMG32)),
                              IMG32)
        with pytest.raises(ValueError, match="unrecognized image"):
            M.numpy_image_decoder(b"\xff\xd8\xff\xe0 not actually jpeg")

    def test_decode_image_default_path(self):
        # decoder=None, fake=False -> autodetect chain; in this sandbox
        # (no PIL/opencv) that IS the numpy decoder
        got = M.decode_image(encode_bmp(IMG32))
        assert np.array_equal(got, IMG32)

    def test_resize_on_decoded(self):
        small = M.resize_image(M.decode_bmp(encode_bmp(IMG32)), 2, 2)
        assert small.shape == (2, 2, 3)

    def test_extract_media_features_real_decode(self, spark):
        """End-to-end Spark path with fake=False: real BMP payloads
        decode inside the mapInPandas batch and the image mean is the
        true pixel mean."""
        payload = encode_bmp(IMG32)
        rows = [(1, "image", bytearray(payload), 3, 2, 16000),
                (2, "audio", bytearray(b"not an image"), 0, 1, 16000)]
        media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
        got = (M.extract_media_features(media, fake=False)
               .toPandas().set_index("media_id"))
        assert got.loc[1, "mean_intensity"] == pytest.approx(
            float(IMG32.mean()))
        assert np.isnan(got.loc[2, "mean_intensity"])
