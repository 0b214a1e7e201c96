"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

(Task-surface module, not reference parity: the reference
— /root/reference/consumer/app/processor.py — processes typed JSON
documents only; multimodal columns are part of this repo's
training-data-pipeline surface, SURVEY.md §2 extras.)

The Spark-side contract is fully real — schemas, Arrow batch shapes,
``mapInPandas`` partitioning, metadata structs. The codec layer decodes
the uncompressed raster formats REAL (pure numpy, no external libs):

- PPM (P6 binary) → (h, w, 3) uint8
- BMP (uncompressed 24-bit BI_RGB, bottom-up or top-down) → (h, w, 3)
- WAV (RIFF PCM 8/16/24/32-bit, any channel count) → (n, ch) float64 in
  [-1, 1) + sample rate (stdlib ``wave`` + numpy — no external libs)

plus ``resize_nearest`` (vectorized nearest-neighbor) and
``audio_features`` (distributed decode → duration/rms/peak per clip).
Compressed formats (JPEG/PNG/MP3/video) need real codec libraries this
container doesn't ship; for those ``decode_image`` raises
``NotImplementedError`` unless ``fake=True`` (deterministic byte-level
pseudo-decode so the distributed plumbing stays testable end-to-end).
Swap in PIL/cv2/ffmpeg at the same seam in production; nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram", T.ArrayType(T.LongType()), False),
    ]
)


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Typed metadata struct beside the opaque binary (JVM-side)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.sha1(F.col(binary_col)).alias("sha1"),
        ),
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic stand-in decode: bytes → uint8 'pixel' array."""
    return np.frombuffer(buf, dtype=np.uint8)


def _decode_ppm(buf: bytes) -> np.ndarray:
    """P6 binary PPM → (h, w, 3) uint8. Header = 'P6' <w> <h> <maxval>
    tokens separated by whitespace/comments, one whitespace byte, then
    raw RGB rows."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # tokenize the header, skipping '#' comments
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    need = w * h * 3
    data = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, 3).copy()


def _decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB. Rows are
    padded to 4-byte multiples and stored bottom-up (negative height =
    top-down); pixels are BGR on disk."""
    if not buf.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def _decode_png(buf: bytes) -> np.ndarray:
    """Real PNG decode with stdlib zlib + numpy: non-interlaced 8-bit
    grayscale / RGB / palette / gray+alpha / RGBA (the overwhelming bulk
    of web PNGs).  Chunk walk → IDAT inflate → per-row unfilter (none/up
    vectorized; sub via per-lane cumulative sum mod 256; avg/paeth
    sequential along the row, vectorized across channels) → (h, w[, c])
    uint8.  16-bit depth and Adam7 interlace raise NotImplementedError
    (honest partial codec, like 16-bit PPM)."""
    import zlib

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        typ = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
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
    depth, ctype, _comp, _filt, interlace = ihdr[8:13]
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace} not supported"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint16)
    bpp = channels
    for y in range(h):
        f, cur = filters[y], data[y].astype(np.uint16)
        prev = out[y - 1] if y else np.zeros(stride, np.uint16)
        if f == 0:
            rec = cur
        elif f == 1:  # sub: per-lane prefix sum mod 256
            lanes = cur.reshape(w, bpp)
            rec = np.cumsum(lanes, axis=0, dtype=np.uint64).astype(
                np.uint16
            ).reshape(stride) & 0xFF
        elif f == 2:  # up
            rec = (cur + prev) & 0xFF
        elif f in (3, 4):  # avg / paeth: sequential in x, vector in c
            rec = np.zeros(stride, np.uint16)
            px = np.zeros(bpp, np.uint16)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                a, b, c = px, prev[s], (
                    prev[s.start - bpp:s.start] if x else np.zeros(bpp, np.uint16)
                )
                if f == 3:
                    rec[s] = (cur[s] + ((a + b) >> 1)) & 0xFF
                else:
                    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    rec[s] = (cur[s] + pred) & 0xFF
                px = rec[s]
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
    img = out.astype(np.uint8).reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) for 8-bit gray/RGB/RGBA —
    the fixture-side inverse of ``_decode_png`` so media tests need no
    image library."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize for (h, w[, c]) arrays."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs]


def decode_image(buf: bytes, fake: bool = False) -> np.ndarray:
    """Real decode for PNG (8-bit gray/RGB/palette/alpha — stdlib zlib +
    numpy unfilter), PPM(P6), and BMP(24-bit); deterministic
    pseudo-decode with ``fake=True`` for anything else (JPEG/video need
    codec libraries this container doesn't ship)."""
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(buf)
    if buf[:2] == b"P6":
        return _decode_ppm(buf)
    if buf[:2] == b"BM":
        return _decode_bmp(buf)
    if fake:
        return _fake_decode(buf)
    raise NotImplementedError(
        "JPEG/video codecs unavailable in this container — PNG/PPM/BMP "
        "decode natively; pass fake=True for the deterministic test decode, "
        "or plug PIL/cv2 here in production"
    )


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM → ((n_frames, channels) float64 in [-1, 1), rate).
    Stdlib ``wave`` parses the container; numpy converts the sample
    stream (8-bit unsigned, 16/32-bit little-endian signed, 24-bit
    packed). Compressed WAV (non-PCM) raises via ``wave`` itself."""
    import io
    import wave

    with wave.open(io.BytesIO(buf)) as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = (v ^ 0x800000) - 0x800000  # sign-extend 24 → 32 bits
        x = v.astype(np.float64) / 8388608.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} bytes")
    return x.reshape(-1, nch), rate


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
    ]
)


def audio_features(df: DataFrame, key_col: str, binary_col: str) -> DataFrame:
    """Distributed audio featurization over WAV binaries via mapInPandas:
    REAL decode (stdlib wave + numpy), then duration / RMS / peak per
    clip — the batch shape a real embedding model (whisper-style) would
    consume. Doubles round to 9 dp so results are replay-deterministic."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[binary_col]):
                x, rate = decode_wav(bytes(buf))
                n = x.shape[0]
                rms = float(np.sqrt((x**2).mean())) if n else 0.0
                peak = float(np.abs(x).max()) if n else 0.0
                rows.append(
                    (
                        str(key),
                        int(rate),
                        int(x.shape[1]),
                        int(n),
                        round(n / rate, 9),
                        round(rms, 9),
                        round(peak, 9),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "sample_rate", "channels", "n_frames",
                    "duration_sec", "rms", "peak",
                ],
            )

    return df.select(key_col, binary_col).mapInPandas(
        featurize, AUDIO_FEATURE_SCHEMA
    )


def extract_features(
    df: DataFrame, key_col: str, binary_col: str, n_bins: int = 16, fake: bool = True
) -> DataFrame:
    """Distributed feature extraction over binary media via mapInPandas:
    per-batch numpy (byte histogram + entropy as the stand-in for real
    embeddings). The batch shape/schema is exactly what a real
    decode+featurize would use."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[binary_col]):
                arr = decode_image(bytes(buf), fake=fake)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                p = hist / max(arr.size, 1)
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0
                rows.append((str(key), int(arr.size), round(entropy, 6), hist.tolist()))
            yield pd.DataFrame(
                rows, columns=["key", "n_bytes", "byte_entropy", "histogram"]
            )

    return df.select(
        F.col(key_col).alias(key_col), F.col(binary_col).alias(binary_col)
    ).mapInPandas(featurize, FEATURE_SCHEMA)


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ]
)


def thumbnails(
    df: DataFrame, key_col: str, binary_col: str, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Distributed decode → nearest-neighbor resize over image binaries
    (real for PPM/BMP): one (key, w, h, raw RGB bytes) row per image."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[binary_col]):
                img = decode_image(bytes(buf))
                small = resize_nearest(img, out_w, out_h)
                rows.append(
                    (str(key), out_w, out_h, small.astype(np.uint8).tobytes())
                )
            yield pd.DataFrame(rows, columns=["key", "width", "height", "pixels"])

    return df.select(key_col, binary_col).mapInPandas(shrink, THUMB_SCHEMA)


def frame_sample(
    df: DataFrame, key_col: str, binary_col: str, every_n: int = 1024, width: int = 64
) -> DataFrame:
    """'Frame sampling' plumbing: slice fixed-width windows every N bytes
    (stand-in for video frame extraction) → one row per (key, frame_no)."""
    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[binary_col]):
                b = bytes(buf)
                for i, off in enumerate(range(0, len(b), every_n)):
                    rows.append((str(key), i, b[off : off + width]))
            yield pd.DataFrame(rows, columns=["key", "frame_no", "frame"])

    return df.select(key_col, binary_col).mapInPandas(sample, schema)
