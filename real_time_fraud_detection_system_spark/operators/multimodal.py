"""Multimodal columns: opaque binary payloads with typed metadata, plus
Pandas-UDF decode/feature plumbing over mapInPandas.

Design (BASELINE.json north star): media travels as a ``binary`` column
with a typed metadata struct beside it; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas stages (mapInPandas), which is the
only sane shape at 100 TB -- bytes never round-trip through Python row by
row, and each batch is one Arrow buffer.

The container has no image/audio codec LIBRARIES, so the decoder
registry ships REAL pure-python codecs -- binary PPM (P6) and PNG
(stdlib zlib + scanline unfilter) behind a sniffing 'image' default,
PCM WAV for 'audio' -- and the feature extractor falls back to a
deterministic byte-level featurizer (documented fake) for video and
for payloads no codec can parse. ``multimodal_features`` wraps image
payloads into true P6 containers so the default oracle run exercises
the real decode path end to end. The Spark-side plumbing -- schema,
partitioning, UDF signature, batch shape -- is real and tested.

The corpus here is synthesized from the documents table (text -> utf-8
bytes) so every engine sees identical payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, spread

HEADER_BYTES = 8
MEDIA_TYPES = ("image", "audio", "video")


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media table synthesized from documents: payload bytes plus a
    typed metadata struct (media_type, n_bytes, fake dims/duration)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.length(payload).alias("n_bytes"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") / 100.0).alias("duration_s"),
        ).alias("meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary column: type, byte length,
    header prefix (hex), content digest. Everything runs on the binary
    payload JVM-side -- the bytes are never decoded."""
    m = media_catalog(spark, sf_dir)
    return m.select(
        "media_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.substring(F.hex("payload"), 1, HEADER_BYTES * 2).alias("header_hex"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("media_id")


MULTIMODAL_META_SQL = f"""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text)) AS n_bytes,
       substr(hex(encode(text)), 1, {HEADER_BYTES * 2}) AS header_hex,
       CAST(n_chars % 1920 AS INT) AS width,
       CAST(n_chars % 1080 AS INT) AS height
FROM documents
ORDER BY media_id
"""


# --------------------------------------------------------------------------
# Decoder registry: the seam where real codecs plug in. A decoder is
# fn(payload: bytes) -> dict with the byte_features keys (n_bytes,
# mean_byte, samples); it may raise NotImplementedError for payloads it
# cannot parse, which falls back to byte_features per row. The registry
# is snapshotted into the mapInPandas closure at plan-build time --
# Python workers import this module fresh, so a driver-side module
# global would be EMPTY on executors; closure capture ships the
# registered functions by value (cloudpickle) instead.
from collections.abc import Callable


def ppm_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary-PPM (P6) payload to (width, height, pixel
    bytes) -- the pixel accessor shared by the feature decoder and
    the perceptual-hash kernel. Header allows '#' comments; non-P6 or
    malformed payloads raise NotImplementedError (the registry
    fallback contract)."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("not a P6 PPM payload")
    try:
        parts: list[int] = []
        idx = 2
        while len(parts) < 3:
            nxt = payload.index(b"\n", idx)
            line = payload[idx:nxt].strip()
            idx = nxt + 1
            if line and not line.startswith(b"#"):
                parts.extend(int(v) for v in line.split())
        w, h, _maxval = parts[:3]
        pixels = payload[idx : idx + 3 * w * h]
        if not pixels:
            raise ValueError("empty pixel section")
        if len(pixels) != 3 * w * h:
            # a header promising more pixels than the body holds must
            # take the undecodable-row path here -- downstream kernels
            # reshape to (w*h, 3) and would die on a ValueError
            # instead of skipping the row (ADVICE r12)
            raise ValueError(
                f"truncated pixel section: {len(pixels)} of {3 * w * h}"
                " bytes"
            )
    except (ValueError, IndexError) as exc:
        raise NotImplementedError(f"malformed P6 payload: {exc}") from exc
    return w, h, pixels


def ppm_image_decoder(payload: bytes) -> dict:
    """The PACKAGED example codec: pure-python binary-PPM (P6). Parses
    the header (width/height/maxval; '#' comments legal) and features
    the PIXEL bytes only -- the point of a real decoder vs the byte
    fallback, which also eats the header. Registered for 'image' by
    default; non-P6 payloads raise NotImplementedError so raw image
    bytes still take the byte-feature fallback. Replace via
    ``register_decoder('image', fn)`` when PIL/ffmpeg are available."""
    _w, _h, pixels = ppm_pixels(payload)
    return {
        "n_bytes": len(pixels),
        "mean_byte": float(sum(pixels)) / len(pixels),
        "samples": [int(b) for b in pixels[:4]],
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, ch: int) -> bytearray:
    """Reverse the per-scanline PNG filters (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) over 8-bit samples. Pure stdlib; the RFC 2083
    reference algorithm, including the exact Paeth tie-breaking."""
    stride = width * ch
    recon = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        recon += line
        prev = line
    return recon


def png_image_decoder(payload: bytes) -> dict:
    """Pure-python PNG codec: stdlib zlib inflate + scanline unfilter.
    Supports 8-bit greyscale/RGB/greyscale+alpha/RGBA (color types
    0/2/4/6), non-interlaced; anything else raises NotImplementedError
    so the row takes the byte-feature fallback. Features run over the
    reconstructed SAMPLE bytes (post-unfilter pixel data), mirroring
    ppm_image_decoder's pixels-not-container contract."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise NotImplementedError("not a PNG payload")
    try:
        pos, idat, ihdr = len(_PNG_SIG), [], None
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            pos += 12 + length  # length + tag + data + CRC
            if ctag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctag == b"IDAT":
                idat.append(data)
            elif ctag == b"IEND":
                break
        if ihdr is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        width, height, depth, ctype, comp, filt, interlace = ihdr
        if depth != 8 or ctype not in _PNG_CHANNELS:
            raise NotImplementedError(
                f"unsupported PNG depth={depth} color_type={ctype}"
            )
        if comp or filt or interlace:
            raise NotImplementedError("unsupported PNG compression/interlace")
        ch = _PNG_CHANNELS[ctype]
        raw = zlib.decompress(b"".join(idat))
        if len(raw) != height * (1 + width * ch):
            raise ValueError("pixel data length mismatch")
        pixels = _png_unfilter(raw, width, height, ch)
    except NotImplementedError:
        raise
    except Exception as exc:  # truncated/corrupt container
        raise NotImplementedError(f"malformed PNG payload: {exc}") from exc
    return {
        "n_bytes": len(pixels),
        "mean_byte": float(sum(pixels)) / len(pixels) if pixels else 0.0,
        "samples": [int(b) for b in pixels[:4]],
    }


def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Minimal PNG writer (8-bit, one filter type for every scanline) --
    the deterministic payload generator the codec tests and sinks use;
    round-trips exactly through png_image_decoder."""
    import struct
    import zlib

    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    assert len(pixels) == stride * height

    def _filt(line: bytearray, prev: bytearray) -> bytearray:
        out = bytearray(len(line))
        for i in range(len(line)):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[i] = (line[i] - pred) & 0xFF
        return out

    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        raw += bytes([filter_type]) + _filt(line, prev)
        prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def image_decoder(payload: bytes) -> dict:
    """The default 'image' codec: container sniffing over the packaged
    pure-python decoders -- P6 PPM or PNG by signature; anything else
    raises NotImplementedError (byte-feature fallback)."""
    if payload.startswith(_PNG_SIG):
        return png_image_decoder(payload)
    return ppm_image_decoder(payload)


def wav_samples(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PCM WAV (RIFF) payload to (sample_rate, channels,
    bits, DATA-section bytes) -- the sample accessor shared by the
    feature decoder and the audio-fingerprint kernel. PCM 8/16-bit
    only; non-RIFF or malformed payloads raise NotImplementedError
    (the registry fallback contract)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    try:
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)  # chunks are word-aligned
            if tag == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif tag == b"data":
                data = body
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_format, ch, rate, _bps, _align, bits = fmt
        if audio_format != 1 or bits not in (8, 16):
            raise NotImplementedError(
                f"unsupported WAV format={audio_format} bits={bits}"
            )
    except NotImplementedError:
        raise
    except Exception as exc:  # truncated/corrupt container
        raise NotImplementedError(f"malformed WAV payload: {exc}") from exc
    return rate, ch, bits, data


def wav_audio_decoder(payload: bytes) -> dict:
    """Pure-python WAV (RIFF) codec, the default 'audio' decoder:
    parses the fmt chunk (PCM only, 8/16-bit) and features the DATA
    section bytes -- the sample stream, container excluded -- mirroring
    the image decoders' pixels-not-container contract. Non-RIFF
    payloads raise NotImplementedError (byte-feature fallback)."""
    _rate, _ch, _bits, data = wav_samples(payload)
    return {
        "n_bytes": len(data),
        "mean_byte": float(sum(data)) / len(data) if data else 0.0,
        "samples": [int(b) for b in data[:4]],
    }


def encode_wav(
    sample_rate: int, channels: int, bits: int, frames: bytes
) -> bytes:
    """Minimal PCM WAV writer -- the deterministic payload generator
    for the codec tests; round-trips exactly through
    wav_audio_decoder."""
    import struct

    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
        + (b"\x00" if len(frames) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def y4m_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a YUV4MPEG2 (Y4M) payload to (width, height, frame byte
    strings) -- the frame accessor shared by the feature decoder and
    the video-fingerprint kernel, and the packaged REAL video
    container parse (the mjpegtools yuv4mpeg stream format: one
    'YUV4MPEG2' header line of space-separated tagged parameters,
    then fixed-size raw frames each introduced by its own 'FRAME'
    parameter line). Supported colorspaces: mono (W*H bytes/frame),
    420/420jpeg/420mpeg2/420paldv (W*H*3/2), 444 (3*W*H); anything
    else, a bad magic, a bad FRAME marker, or a truncated frame
    raises NotImplementedError (the registry fallback contract)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError("not a YUV4MPEG2 payload")
    try:
        nl = payload.index(b"\n")
        w = h = 0
        cspace = b"420jpeg"  # the yuv4mpeg(5) default
        for tag in payload[9:nl].split():
            if tag[:1] == b"W":
                w = int(tag[1:])
            elif tag[:1] == b"H":
                h = int(tag[1:])
            elif tag[:1] == b"C":
                cspace = tag[1:]
        if w <= 0 or h <= 0:
            raise ValueError("missing/invalid W/H header parameters")
        if cspace == b"mono":
            fsize = w * h
        elif cspace in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
            fsize = w * h + 2 * ((w // 2) * (h // 2))
        elif cspace == b"444":
            fsize = 3 * w * h
        else:
            raise NotImplementedError(
                f"unsupported Y4M colorspace {cspace!r}"
            )
        frames: list[bytes] = []
        pos = nl + 1
        while pos < len(payload):
            if payload[pos : pos + 5] != b"FRAME":
                raise ValueError(f"bad FRAME marker at offset {pos}")
            fnl = payload.index(b"\n", pos)
            pos = fnl + 1
            frame = payload[pos : pos + fsize]
            if len(frame) != fsize:
                raise ValueError("truncated frame payload")
            frames.append(frame)
            pos += fsize
    except NotImplementedError:
        raise
    except Exception as exc:  # truncated/corrupt container
        raise NotImplementedError(f"malformed Y4M payload: {exc}") from exc
    return w, h, frames


def y4m_video_decoder(payload: bytes) -> dict:
    """Pure-python Y4M codec, the default 'video' decoder: walks the
    container (header parameters + per-FRAME markers) and features
    the concatenated FRAME bytes only -- the sample stream, container
    excluded -- mirroring the image/audio decoders'
    pixels-not-container contract. Non-Y4M payloads raise
    NotImplementedError (byte-feature fallback)."""
    _w, _h, frames = y4m_frames(payload)
    data = b"".join(frames)
    return {
        "n_bytes": len(data),
        "mean_byte": float(sum(data)) / len(data) if data else 0.0,
        "samples": [int(b) for b in data[:4]],
    }


def encode_y4m(
    width: int, height: int, frames: list[bytes],
    colorspace: str = "mono", fps: tuple[int, int] = (25, 1),
    xtag: str | None = None,
) -> bytes:
    """Minimal YUV4MPEG2 writer -- the deterministic payload generator
    for the codec tests; round-trips exactly through y4m_frames. The
    optional application X-tag and the frame rate live only in the
    container header, which is what makes the re-encode invariance
    tests meaningful (same frames, different container metadata)."""
    if colorspace == "mono":
        fsize = width * height
    elif colorspace in ("420", "420jpeg", "420mpeg2", "420paldv"):
        fsize = width * height + 2 * ((width // 2) * (height // 2))
    elif colorspace == "444":
        fsize = 3 * width * height
    else:
        raise ValueError(f"unsupported colorspace {colorspace}")
    assert all(len(f) == fsize for f in frames)
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1"
        f" C{colorspace}" + (f" X{xtag}" if xtag else "") + "\n"
    ).encode("ascii")
    return header + b"".join(b"FRAME\n" + f for f in frames)


_DEFAULT_DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": image_decoder,
    "audio": wav_audio_decoder,
    "video": y4m_video_decoder,
}
_DECODERS: dict[str, Callable[[bytes], dict]] = dict(_DEFAULT_DECODERS)


def register_decoder(media_type: str, fn: Callable[[bytes], dict]) -> None:
    """Install a real codec for ``media_type`` ('image'/'audio'/'video'),
    replacing the packaged default if any. Queries built AFTER
    registration use it; the byte-feature fallback remains the default
    for unregistered types and unparseable rows."""
    _DECODERS[media_type] = fn


def unregister_decoder(media_type: str) -> None:
    """Remove a custom codec, restoring the packaged default for the
    media type (the P6 decoder for 'image', nothing otherwise)."""
    _DECODERS.pop(media_type, None)
    if media_type in _DEFAULT_DECODERS:
        _DECODERS[media_type] = _DEFAULT_DECODERS[media_type]


def decode_media(payload: bytes, media_type: str, decoders=None):
    """Codec decode via the registry. 'image' ships the P6 decoder by
    default; no decoder registered (this container has no PIL/ffmpeg
    for audio/video) -> NotImplementedError, and callers use
    ``byte_features`` as the deterministic fallback."""
    fn = (_DECODERS if decoders is None else decoders).get(media_type)
    if fn is None:
        raise NotImplementedError(
            f"no codec registered for media_type={media_type!r}; "
            "install pillow/torchaudio/av and register_decoder() it"
        )
    return fn(payload)


def byte_features(payload: bytes, n_samples: int = 4) -> dict:
    """Deterministic fake featurizer over raw bytes: mean byte value and
    evenly spaced 'frame samples'. Stands in for decode+embed. Vectorized
    with numpy -- a Python ``sum()`` over payload bytes is 50x slower and
    would dominate the pandas stage at any real payload size."""
    import numpy as np

    n = len(payload)
    arr = np.frombuffer(payload, dtype=np.uint8)
    mean = float(arr.mean()) if n else 0.0
    step = max(1, n // n_samples)
    samples = (
        [int(arr[min(i * step, n - 1)]) for i in range(n_samples)] if n else []
    )
    return {"n_bytes": n, "mean_byte": mean, "samples": samples}


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("samples", T.ArrayType(T.IntegerType())),
    ]
)


def _feature_kernel(decoders: dict):
    """Build the mapInPandas kernel with the decoder snapshot baked into
    its closure (see registry note above): one Arrow batch in, one
    feature frame out. Tries the registered decoder, falls back to the
    byte featurizer per row."""

    def _feature_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar assembly (round-13 optimization, guide §4.2):
            # pd.DataFrame(list-of-dicts) re-infers every cell; the
            # dict-of-lists constructor is a straight column build.
            # The per-row decode itself is the codec registry's
            # documented contract and stays row-wise.
            ids, types, nbytes, means, samps = [], [], [], [], []
            for media_id, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                data = bytes(payload)
                try:
                    feats = decode_media(data, mtype, decoders)
                except NotImplementedError:
                    feats = byte_features(data)
                ids.append(media_id)
                types.append(mtype)
                nbytes.append(feats["n_bytes"])
                means.append(feats["mean_byte"])
                samps.append(feats["samples"])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": types,
                    "n_bytes": nbytes,
                    "mean_byte": means,
                    "samples": samps,
                }
            )

    return _feature_batches


def media_features(m: DataFrame) -> DataFrame:
    """Feature extraction over any (media_id, payload, media_type)
    frame, using whatever decoders are registered at plan-build time."""
    return m.mapInPandas(_feature_kernel(dict(_DECODERS)), FEATURES_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. Image
    payloads are wrapped into true binary-PPM (P6) containers -- width
    n//3, height 1, pixel section = the leading 3*(n//3) payload bytes
    -- so the packaged P6 decoder runs a REAL parse+decode on every
    image row (header excluded from the features); audio/video rows
    keep raw bytes and take the byte-feature fallback. All the
    container assembly is JVM-side concat/substring on binary."""
    m = media_catalog(spark, sf_dir).select(
        "media_id", "payload", F.col("meta.media_type").alias("media_type")
    )
    npix = (F.length("payload") / F.lit(3)).cast("long")
    header = F.encode(
        F.concat(F.lit("P6\n"), npix.cast("string"), F.lit(" 1\n255\n")),
        "UTF-8",
    )
    m = m.withColumn(
        "payload",
        F.when(
            (F.col("media_type") == "image") & (npix > 0),
            F.concat(header, F.expr("substring(payload, 1, "
                                    "3 * (length(payload) div 3))")),
        ).otherwise(F.col("payload")),
    )
    return (
        media_features(m)
        .select(
            "media_id",
            "media_type",
            "n_bytes",
            F.round("mean_byte", 6).alias("mean_byte"),
            # serialize: the driver's canonicalizer sorts the result frame
            # and cannot hash array cells, so arrays leave as CSV strings
            F.array_join(
                F.expr("transform(samples, x -> cast(x AS string))"), ","
            ).alias("samples"),
        )
        .orderBy("media_id")
    )


# Oracle: text is ASCII, so byte values == character codes; DuckDB
# recomputes the same features character-wise. Image rows mirror the
# P6 decode: features over the PIXEL section only (the leading
# 3*(n//3) bytes; the wrapped header is excluded), samples = first 4
# pixel bytes. Audio/video rows mirror the byte fallback (whole
# payload, strided samples). (The pandas path reads real bytes -- the
# test suite additionally asserts the two agree.)
MULTIMODAL_FEATURES_SQL = """
WITH b AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         text,
         octet_length(encode(text)) AS raw_n,
         CASE WHEN CAST(doc_id % 3 AS INT) = 0
                   AND octet_length(encode(text)) >= 3
              THEN 3 * (octet_length(encode(text)) // 3)
              ELSE octet_length(encode(text)) END AS n_bytes,
         (CAST(doc_id % 3 AS INT) = 0
          AND octet_length(encode(text)) >= 3) AS decoded
  FROM documents
)
SELECT media_id, media_type, CAST(n_bytes AS INT) AS n_bytes,
       round(list_sum(list_transform(range(1, n_bytes + 1),
                                     i -> ascii(text[i]))) / n_bytes, 6)
         AS mean_byte,
       CASE WHEN decoded
            THEN array_to_string(list_transform(
                   range(1, least(4, n_bytes) + 1), i -> ascii(text[i])), ',')
            ELSE array_to_string(list_transform(range(0, 4),
                   k -> ascii(text[least(k * greatest(1, raw_n // 4) + 1,
                                         raw_n)])), ',')
       END AS samples
FROM b
ORDER BY media_id
"""


# --------------------------------------------------------------------------
# Frame sampling: the video-pipeline primitive (decode -> sample N frames
# -> per-frame features). Since round 13 the video rows are wrapped into
# REAL YUV4MPEG2 containers JVM-side and the kernel extracts their
# frames with the packaged y4m_frames codec (each media row explodes
# into one row per EXTRACTED frame inside the Arrow batch); rows whose
# payload is not a parseable container -- image/audio modalities, or
# video too short to hold a frame -- keep the evenly-strided byte-span
# fallback, the codec registry's per-row contract applied at frame
# granularity.
N_FRAMES = 3
FRAME_WIN = 16  # bytes summarized per sampled frame

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.IntegerType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        ids, idxs, offs, means = [], [], [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            raw = bytes(payload)
            try:
                _w, _h, frames = y4m_frames(raw)
            except NotImplementedError:
                frames = None
            if frames is not None:
                # real container: one row per extracted frame, offset
                # measured in the SAMPLE stream (concatenated frames)
                off = 0
                for k, fb in enumerate(frames):
                    win = np.frombuffer(fb[:FRAME_WIN], dtype=np.uint8)
                    ids.append(media_id)
                    idxs.append(k)
                    offs.append(off)
                    means.append(float(win.mean()) if len(win) else 0.0)
                    off += len(fb)
                continue
            data = np.frombuffer(raw, dtype=np.uint8)
            n = len(data)
            if n == 0:
                continue
            stride = max(1, n // N_FRAMES)
            for k in range(N_FRAMES):
                off = min(k * stride, n - 1)
                win = data[off : off + FRAME_WIN]
                ids.append(media_id)
                idxs.append(k)
                offs.append(off)
                means.append(float(win.mean()))
        yield pd.DataFrame(
            {
                "media_id": ids,
                "frame_idx": idxs,
                "frame_offset": offs,
                "frame_mean": means,
            }
        )


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame samples over the media catalog, one output row per
    frame, each summarized by the mean of its leading FRAME_WIN-byte
    window. Video rows (>= N_FRAMES bytes) are
    wrapped JVM-side into true Y4M containers holding N_FRAMES
    equal-size mono frames (length n DIV N_FRAMES), so the kernel
    runs the packaged codec's REAL container walk and reports the
    extracted frames; image/audio rows and unwrappable video rows
    take the evenly-strided byte-span fallback. Arrow-batched; bytes
    never leave the executor."""
    m = media_catalog(spark, sf_dir).select(
        "media_id", "payload", F.col("meta.media_type").alias("media_type")
    )
    fl = f"(length(payload) DIV {N_FRAMES})"
    header = F.encode(
        F.concat(
            F.lit("YUV4MPEG2 W"),
            F.expr(f"CAST({fl} AS STRING)"),
            F.lit(" H1 F25:1 Ip A1:1 Cmono\n"),
        ),
        "UTF-8",
    )
    parts = [header]
    for k in range(N_FRAMES):
        parts.append(F.encode(F.lit("FRAME\n"), "UTF-8"))
        parts.append(F.expr(f"substring(payload, {k} * {fl} + 1, {fl})"))
    m = m.withColumn(
        "payload",
        F.when(
            (F.col("media_type") == "video")
            & (F.length("payload") >= N_FRAMES),
            F.concat(*parts),
        ).otherwise(F.col("payload")),
    ).select("media_id", "payload")
    return (
        m.mapInPandas(_frame_batches, FRAMES_SCHEMA)
        .select(
            "media_id",
            "frame_idx",
            "frame_offset",
            F.round("frame_mean", 6).alias("frame_mean"),
        )
        .orderBy("media_id", "frame_idx")
    )


# Oracle: video rows (doc_id % 3 = 2) with >= N_FRAMES bytes mirror the
# Y4M wrap -- frame k IS the fl-byte span at offset k*fl, fl = n DIV
# N_FRAMES, summarized by its leading min(FRAME_WIN, fl) bytes -- and
# every other row mirrors the strided-span fallback.
MULTIMODAL_FRAMES_SQL = f"""
WITH b AS (
  SELECT doc_id AS media_id, text,
         octet_length(encode(text)) AS n_bytes,
         (CAST(doc_id % 3 AS INT) = 2
          AND octet_length(encode(text)) >= {N_FRAMES}) AS decoded
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
f AS (
  SELECT media_id, text, n_bytes, decoded,
         unnest(range(0, {N_FRAMES})) AS frame_idx,
         greatest(1, n_bytes // {N_FRAMES}) AS stride,
         n_bytes // {N_FRAMES} AS fl
  FROM b
),
o AS (
  SELECT media_id, frame_idx, n_bytes, text,
         CASE WHEN decoded THEN frame_idx * fl
              ELSE least(frame_idx * stride, n_bytes - 1) END AS off,
         CASE WHEN decoded THEN least({FRAME_WIN}, fl)
              ELSE least({FRAME_WIN},
                         n_bytes - least(frame_idx * stride, n_bytes - 1))
         END AS win
  FROM f
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(off AS INT) AS frame_offset,
       round(list_sum(list_transform(range(off + 1, off + win + 1),
                                     i -> ascii(text[i]))) / win, 6)
         AS frame_mean
FROM o
ORDER BY media_id, frame_idx
"""


# --------------------------------------------------------------------------
# Resize: fixed-length downsample of the payload (the image-resize slot
# in the decode -> resize -> embed chain; real codecs replace the
# byte-pooling kernel, the Spark plumbing is identical). Mean pooling
# over RESIZE_N contiguous chunks -> array<double> per media row.
RESIZE_N = 8


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        ids, thumbs = [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            data = np.frombuffer(bytes(payload), dtype=np.uint8)
            n = len(data)
            if n == 0:
                continue
            bounds = [n * k // RESIZE_N for k in range(RESIZE_N + 1)]
            thumb = [
                round(float(data[bounds[k]:bounds[k + 1]].mean()), 6)
                if bounds[k + 1] > bounds[k]
                else 0.0
                for k in range(RESIZE_N)
            ]
            ids.append(media_id)
            thumbs.append(thumb)
        yield pd.DataFrame({"media_id": ids, "thumb": thumbs})


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("thumb", T.ArrayType(T.DoubleType())),
    ]
)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIZE_N-value mean-pooled 'thumbnail' per payload, serialized to a
    fixed %.6f CSV string (driver canon cannot hash array cells, and fixed
    formatting sidesteps shortest-float-repr divergence vs DuckDB)."""
    m = media_catalog(spark, sf_dir).select("media_id", "payload")
    return (
        m.mapInPandas(_resize_batches, RESIZE_SCHEMA)
        .select(
            "media_id",
            F.array_join(
                F.expr("transform(thumb, x -> format_string('%.6f', x))"), ","
            ).alias("thumb"),
        )
        .orderBy("media_id")
    )


MULTIMODAL_RESIZE_SQL = f"""
WITH b AS (
  SELECT doc_id AS media_id, text,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
)
SELECT media_id,
       array_to_string(list_transform(range(0, {RESIZE_N}), k ->
         printf('%.6f',
           CASE WHEN (n * (k + 1)) // {RESIZE_N} > (n * k) // {RESIZE_N}
                THEN round(list_sum(list_transform(
                         range((n * k) // {RESIZE_N} + 1,
                               (n * (k + 1)) // {RESIZE_N} + 1),
                         i -> ascii(text[i])))
                     / ((n * (k + 1)) // {RESIZE_N} - (n * k) // {RESIZE_N}), 6)
                ELSE 0.0 END)), ',') AS thumb
FROM b
ORDER BY media_id
"""


# --------------------------------------------------------------------------
# Perceptual-hash image dedup (round-11 verdict Next #4): the dedup
# family's text (MinHash/SimHash/PPJoin) and embedding (SemDeDup) legs
# applied to the MULTIMODAL column itself. Pipeline: real P6 decode
# (the packaged codec) -> grayscale -> fixed 60-cell integer grid ->
# aHash bit per cell (cell mean vs global mean, compared
# cross-multiplied so the whole fingerprint is exact BIGINT
# arithmetic) -> near-dup candidacy via the SAME 20-key 3-of-6-block
# scheme as dedup_simhash (dedup._wide_fp_pairs runs on any frame
# with a ``simhash`` column), Hamming <= 3.
#
# aHash is INVARIANT under uniform brightness shift: shifting every
# byte by +c adds 9c*cell_n to a cell sum and 9c*total_n to the total,
# and the cross-multiplied compare cancels both -- which is exactly
# the re-encode robustness a byte-level digest (dedup_exact's md5)
# lacks. The registry query exercises it end to end by unioning each
# image with a deterministic brightness-shifted twin (every char code
# +3 via translate -- the corpus alphabet is space+lowercase, so no
# byte ever clips; chars outside the mapping pass through unchanged
# on BOTH engines) and catching every (original, twin) pair at
# Hamming 0.

PHASH_CELLS = 60  # == dedup.SIMHASH64_BITS: the block machinery reuses
PHASH_TWIN_OFFSET = 10_000_000
_PHASH_FROM = " abcdefghijklmnopqrstuvwxyz"
_PHASH_TO = "#defghijklmnopqrstuvwxyz{|}"

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        ids, fps = [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            try:
                w, h, pix = ppm_pixels(bytes(payload))
            except NotImplementedError:
                continue  # undecodable: no fingerprint, no pairs
            npix = w * h
            gray = (
                np.frombuffer(pix[: 3 * npix], dtype=np.uint8)
                .reshape(npix, 3)
                .sum(axis=1, dtype=np.int64)
            )
            total = int(gray.sum())
            # bit k = 1 iff cell mean > global mean, cross-multiplied
            # to exact int64 (empty cells compare 0 > 0: bit 0). The
            # 60 bits evaluate as one vectorized comparison (round-13
            # optimization, guide §4.2 -- the per-cell Python loop was
            # 60 interpreted iterations per row); magnitudes are
            # bounded by 765 * npix^2 << 2^63, so the integer compare
            # is exact and identical to the scalar form.
            bounds = (
                np.arange(PHASH_CELLS + 1, dtype=np.int64) * npix
            ) // PHASH_CELLS
            csum = np.concatenate(([0], np.cumsum(gray)))
            cell = csum[bounds[1:]] - csum[bounds[:-1]]
            width = bounds[1:] - bounds[:-1]
            bits = (cell * npix) > (total * width)
            fp = int(
                (
                    bits.astype(np.int64)
                    << np.arange(PHASH_CELLS, dtype=np.int64)
                ).sum()
            )
            ids.append(media_id)
            fps.append(fp)
        yield pd.DataFrame({"media_id": ids, "simhash": fps})


def phash_fingerprints(media: DataFrame) -> DataFrame:
    """60-bit aHash fingerprints for a (media_id, payload) frame of P6
    images, via the packaged pure-python codec in an Arrow-batched
    kernel. Row-major pixel order; the fixed integer grid runs over
    the flattened pixel sequence, so the same kernel serves 1-row
    synthetic wraps and real 2-D images."""
    return media.select("media_id", "payload").mapInPandas(
        _phash_batches, PHASH_SCHEMA
    )


def dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the image rows of the media
    catalog, each image unioned with its deterministic
    brightness-shifted re-encode twin (media_id + {PHASH_TWIN_OFFSET}):
    (a_id, b_id, hamming) at Hamming <= 3 under the 60-cell aHash.
    Every (original, twin) pair lands at Hamming 0 BY THE INVARIANCE
    ARGUMENT above -- the engineered proof that a re-encoded duplicate
    is caught -- while unrelated images pair only on genuine
    fingerprint proximity.

    Scale shape: one decode pass per image (Arrow kernel, real P6
    parse), then the candidate join runs on DISTINCT fingerprints with
    the first-combo filter (dedup_simhash's exact machinery) -- no
    quadratic stage, no corpus-sized broadcast; docs join the pair set
    back by fingerprint at the end."""
    from .dedup import wide_pair_join

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    # single-byte (ASCII) filter: the engine fingerprints UTF-8 bytes,
    # the oracle indexes characters -- identical only when every char
    # is one byte, so the assumption is enforced structurally on both
    # engines (ADVICE r12; output-neutral on the all-ASCII corpus)
    imgs = docs.filter(
        "doc_id % 3 = 0 AND length(encode(text, 'UTF-8')) >= 3"
        " AND length(text) = length(encode(text, 'UTF-8'))"
    )
    base = imgs.selectExpr("doc_id AS media_id", "text")
    twin = imgs.selectExpr(
        f"doc_id + {PHASH_TWIN_OFFSET} AS media_id",
        f"translate(text, '{_PHASH_FROM}', '{_PHASH_TO}') AS text",
    )
    payload = F.encode("text", "UTF-8")
    npix = (F.length(payload) / F.lit(3)).cast("long")
    header = F.encode(
        F.concat(F.lit("P6\n"), npix.cast("string"), F.lit(" 1\n255\n")),
        "UTF-8",
    )
    media = base.unionByName(twin).select(
        "media_id",
        F.concat(
            header,
            F.expr(
                "substring(encode(text, 'UTF-8'), 1, "
                "3 * (length(encode(text, 'UTF-8')) div 3))"
            ),
        ).alias("payload"),
    )
    # cache: three consumers (pair candidacy + both join-back sides)
    # would otherwise each re-run the decode kernel -- the dominant
    # cost -- per branch (dedup_simhash's discipline, dedup.py)
    fp = phash_fingerprints(media).cache()
    return wide_pair_join(fp, "media_id").orderBy("a_id", "b_id")


def _dedup_phash_sql() -> str:
    from .dedup import (
        _DUCK_WIDE_PAIRS,
        _duck_wide_half,
        _duck_wide_pair_select,
    )

    cell_sum = (
        "COALESCE(list_sum(list_transform("
        "range(3 * ((npix * k) // 60) + 1, "
        "3 * ((npix * (k + 1)) // 60) + 1), i -> ascii(text[i]))), 0)"
    )
    total_sum = (
        "list_sum(list_transform(range(1, 3 * npix + 1), "
        "i -> ascii(text[i])))"
    )
    cell_n = "(((npix * (k + 1)) // 60) - ((npix * k) // 60))"
    return f"""
WITH img AS (
  SELECT doc_id AS media_id, text FROM documents
  WHERE doc_id % 3 = 0 AND octet_length(encode(text)) >= 3
    AND length(text) = octet_length(encode(text))
  UNION ALL
  SELECT doc_id + {PHASH_TWIN_OFFSET} AS media_id,
         translate(text, '{_PHASH_FROM}', '{_PHASH_TO}') AS text
  FROM documents
  WHERE doc_id % 3 = 0 AND octet_length(encode(text)) >= 3
    AND length(text) = octet_length(encode(text))
),
px AS (
  SELECT media_id, text,
         octet_length(encode(text)) // 3 AS npix
  FROM img
),
fp AS (
  SELECT media_id,
         CAST(list_sum(list_transform(range(0, {PHASH_CELLS}), k ->
           CASE WHEN {cell_sum} * npix > {total_sum} * {cell_n}
                THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT)
           AS simhash
  FROM px
),
nodes AS (SELECT DISTINCT simhash FROM fp),
half AS ({_duck_wide_half("nodes")}),
close_pairs AS ({_DUCK_WIDE_PAIRS})
{_duck_wide_pair_select("media_id")}
ORDER BY a_id, b_id
"""


# --------------------------------------------------------------------------
# Audio fingerprint dedup: the perceptual family's AUDIO member (image:
# dedup_phash). Pipeline: real RIFF/WAV parse (the packaged codec) ->
# energy envelope over a fixed 61-window integer grid of the PCM byte
# stream -> a dHash-style bit per ADJACENT-window energy step (bit k =
# window k louder than window k+1, compared cross-multiplied so the
# whole fingerprint is exact BIGINT arithmetic) -> the same 20-key
# 3-of-6-block candidacy, Hamming <= 3.
#
# The delta form (vs phash's global-mean form) is the audio-relevant
# one: it is INVARIANT under DC offset -- shifting every sample by +c
# adds c*|w_k| to each window sum and the cross-multiplied compare
# (s_k + c*c_k)*c_{k+1} > (s_{k+1} + c*c_{k+1})*c_k cancels the offset
# term exactly -- the re-record robustness a byte digest lacks. The
# registry query exercises it end to end with the same deterministic
# +3 twin construction as dedup_phash.

AUDIO_FP_BITS = 60  # 61 windows -> 60 adjacent-step bits
AUDIO_TWIN_OFFSET = 10_000_000


def _audio_fp_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    nw = AUDIO_FP_BITS + 1
    for pdf in batches:
        ids, fps = [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            try:
                _rate, _ch, _bits, data = wav_samples(bytes(payload))
            except NotImplementedError:
                continue  # undecodable: no fingerprint, no pairs
            n = len(data)
            if n == 0:
                continue
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(arr)))
            # the 60 adjacent-window energy comparisons evaluate as one
            # vectorized exact-int64 compare (round-13 optimization,
            # guide §4.2 -- was a 61-element list comprehension + a
            # 60-iteration Python loop per row); magnitudes bounded by
            # 255 * n^2 << 2^63, identical to the scalar form.
            bounds = (np.arange(nw + 1, dtype=np.int64) * n) // nw
            s = csum[bounds[1:]] - csum[bounds[:-1]]
            c = bounds[1:] - bounds[:-1]
            bits = (s[:-1] * c[1:]) > (s[1:] * c[:-1])
            fp = int(
                (
                    bits.astype(np.int64)
                    << np.arange(AUDIO_FP_BITS, dtype=np.int64)
                ).sum()
            )
            ids.append(media_id)
            fps.append(fp)
        yield pd.DataFrame({"media_id": ids, "simhash": fps})


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """60-bit energy-envelope fingerprints for a (media_id, payload)
    frame of PCM WAV payloads, via the packaged pure-python codec in
    an Arrow-batched kernel. The envelope runs over the raw DATA
    section byte stream (for the packaged 8-bit fixture that IS the
    sample sequence; 16-bit streams fingerprint their interleaved
    bytes -- deterministic either way)."""
    return media.select("media_id", "payload").mapInPandas(
        _audio_fp_batches, PHASH_SCHEMA
    )


def _le32(e: str) -> str:
    """Spark SQL binary expression: ``e`` (a non-negative int expr)
    as 4 little-endian bytes -- the RIFF length-field encoder for the
    JVM-side WAV container wrap."""
    h = f"lpad(hex({e}), 8, '0')"
    return (
        f"concat(unhex(substr({h}, 7, 2)), unhex(substr({h}, 5, 2)),"
        f" unhex(substr({h}, 3, 2)), unhex(substr({h}, 1, 2)))"
    )


def dedup_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the AUDIO rows of the media
    catalog, each clip unioned with its deterministic DC-shifted
    re-record twin (media_id + {AUDIO_TWIN_OFFSET}): (a_id, b_id,
    hamming) at Hamming <= 3 under the 61-window energy-envelope
    dHash. Every (original, twin) pair lands at Hamming 0 BY THE
    OFFSET-INVARIANCE ARGUMENT above; unrelated clips pair only on
    genuine envelope proximity.

    The payloads are wrapped JVM-side into REAL 8-bit PCM WAV
    containers (RIFF/fmt/data chunks, little-endian length fields
    assembled from hex arithmetic), so the kernel runs the packaged
    codec's full chunk-walk parse on every row -- the same
    decode-is-real discipline as dedup_phash's P6 wrap. Scale shape:
    one decode pass per clip (Arrow kernel), then the candidate join
    runs on DISTINCT fingerprints with the first-combo filter; no
    quadratic stage, no corpus-sized broadcast."""
    from .dedup import wide_pair_join

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    clips = docs.filter(
        "doc_id % 3 = 1 AND length(encode(text, 'UTF-8')) >= 1"
        " AND length(text) = length(encode(text, 'UTF-8'))"
    )
    base = clips.selectExpr("doc_id AS media_id", "text")
    twin = clips.selectExpr(
        f"doc_id + {AUDIO_TWIN_OFFSET} AS media_id",
        f"translate(text, '{_PHASH_FROM}', '{_PHASH_TO}') AS text",
    )
    n = "length(encode(text, 'UTF-8'))"
    # RIFF/WAVE + fmt(PCM, 1ch, 8kHz, 8-bit) + data header, then the
    # sample bytes; constants pre-hexed, lengths via _le32
    header = (
        f"concat(unhex('52494646'), {_le32(f'36 + {n}')},"
        f" unhex('57415645666D7420'), {_le32('16')},"
        f" unhex('01000100401F0000401F000001000800'),"
        f" unhex('64617461'), {_le32(n)})"
    )
    media = base.unionByName(twin).selectExpr(
        "media_id",
        f"concat({header}, encode(text, 'UTF-8')) AS payload",
    )
    # cache: same three-consumer shape as dedup_phash; the WAV
    # chunk-walk decode is the dominant cost
    fp = audio_fingerprints(media).cache()
    return wide_pair_join(fp, "media_id").orderBy("a_id", "b_id")


def _dedup_audio_fp_sql() -> str:
    from .dedup import (
        _DUCK_WIDE_PAIRS,
        _duck_wide_half,
        _duck_wide_pair_select,
    )

    nw = AUDIO_FP_BITS + 1
    # per-row list of 61 window sums (1-indexed: s[k+1] is window k)
    s_list = (
        f"list_transform(range(0, {nw}), k -> COALESCE(list_sum("
        f"list_transform(range((n * k) // {nw} + 1,"
        f" (n * (k + 1)) // {nw} + 1), i -> ascii(text[i]))), 0))"
    )
    ck = f"((n * (k + 1)) // {nw} - (n * k) // {nw})"
    ck1 = f"((n * (k + 2)) // {nw} - (n * (k + 1)) // {nw})"
    return f"""
WITH clip AS (
  SELECT doc_id AS media_id, text FROM documents
  WHERE doc_id % 3 = 1 AND octet_length(encode(text)) >= 1
    AND length(text) = octet_length(encode(text))
  UNION ALL
  SELECT doc_id + {AUDIO_TWIN_OFFSET} AS media_id,
         translate(text, '{_PHASH_FROM}', '{_PHASH_TO}') AS text
  FROM documents
  WHERE doc_id % 3 = 1 AND octet_length(encode(text)) >= 1
    AND length(text) = octet_length(encode(text))
),
px AS (
  SELECT media_id, text, octet_length(encode(text)) AS n FROM clip
),
sums AS (
  SELECT media_id, n, {s_list} AS s FROM px
),
fp AS (
  SELECT media_id,
         CAST(list_sum(list_transform(range(0, {AUDIO_FP_BITS}), k ->
           CASE WHEN s[k + 1] * {ck1} > s[k + 2] * {ck}
                THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT)
           AS simhash
  FROM sums
),
nodes AS (SELECT DISTINCT simhash FROM fp),
half AS ({_duck_wide_half("nodes")}),
close_pairs AS ({_DUCK_WIDE_PAIRS})
{_duck_wide_pair_select("media_id")}
ORDER BY a_id, b_id
"""


# --------------------------------------------------------------------------
# Video fingerprint dedup: the perceptual family's VIDEO member,
# completing the modality triple (image: dedup_phash, audio:
# dedup_audio_fp). Since round 13 the decode is REAL: clips are
# wrapped JVM-side into true YUV4MPEG2 containers ({VIDEO_FRAMES}
# equal-size mono frames behind per-FRAME markers) and the kernel
# runs the packaged y4m_frames chunk-walk parse -- header parameters,
# FRAME marker walk, truncation checks; malformed containers take the
# documented undecodable-row skip -- matching the P6/PNG/WAV
# discipline. Everything downstream is the production shape: one
# 24-bit brightness-invariant aHash PER EXTRACTED FRAME (wide enough
# that a position-bucket holds only genuinely-matching frames at
# 100x -- the 12-bit draft averaged ~81 clips per (position, hash)
# bucket at 500k docs and paid a 107M-row collision join), clips
# joined on exact (frame_position, frame_hash) equality, a pair
# reported when >= {VIDEO_MIN_MATCH} of {VIDEO_FRAMES} positions
# match. That positional-frame-matching join IS how frame-sampled
# video dedup runs at scale (per-frame perceptual hash + temporal
# alignment); swapping Y4M for an ffmpeg keyframe reader changes no
# plan shape -- only the bytes handed to the per-frame hash.

VIDEO_FRAMES = 8
VIDEO_FRAME_BITS = 24
VIDEO_MIN_MATCH = 6
VIDEO_TWIN_OFFSET = 10_000_000

FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hash", T.LongType()),
    ]
)


def _video_hash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        ids, idxs, hashes = [], [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            try:
                _w, _h, frames = y4m_frames(bytes(payload))
            except NotImplementedError:
                continue  # undecodable: no fingerprint, no pairs
            for k, fb in enumerate(frames):
                m = len(fb)
                arr = np.frombuffer(fb, dtype=np.uint8).astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(arr)))
                fsum = int(csum[m])
                h = 0
                for j in range(VIDEO_FRAME_BITS):
                    clo = m * j // VIDEO_FRAME_BITS
                    chi = m * (j + 1) // VIDEO_FRAME_BITS
                    csum_j = int(csum[chi]) - int(csum[clo])
                    # bit = cell mean > frame mean, cross-multiplied
                    # (empty frame/cell: 0 > 0 false -> bit 0)
                    if csum_j * m > fsum * (chi - clo):
                        h |= 1 << j
                ids.append(media_id)
                idxs.append(k)
                hashes.append(h)
        yield pd.DataFrame(
            {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
        )


def video_frame_hashes(media: DataFrame) -> DataFrame:
    """One (media_id, frame_idx, frame_hash) row per frame the
    packaged Y4M codec extracts from each (media_id, payload) clip:
    the frame-sampled perceptual signature. Each frame's
    {VIDEO_FRAME_BITS}-bit aHash compares cell mean vs FRAME mean
    cross-multiplied -- exact integers, and invariant per frame under
    uniform brightness shift (the offset cancels). Container metadata
    (frame rate, X-tags) never reaches the hash -- re-encodes of the
    same frames fingerprint identically (test-pinned). Undecodable
    payloads yield no rows (the registry skip contract)."""
    return media.select("media_id", "payload").mapInPandas(
        _video_hash_batches, FRAME_HASH_SCHEMA
    )


def dedup_video_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampled near-dup pairs over the VIDEO rows of the media
    catalog, each clip unioned with its deterministic
    brightness-shifted re-encode twin (media_id +
    {VIDEO_TWIN_OFFSET}): (a_id, b_id, n_match) for clip pairs whose
    frame hashes agree at >= {VIDEO_MIN_MATCH} of {VIDEO_FRAMES}
    positions. Every (original, twin) pair matches at ALL positions
    by per-frame invariance; unrelated clips must collide at 6+
    independent {VIDEO_FRAME_BITS}-bit positions.

    The payloads are wrapped JVM-side into REAL YUV4MPEG2 containers
    ({VIDEO_FRAMES} equal-size 1-row mono frames of length
    n DIV {VIDEO_FRAMES}; the sub-frame byte tail is dropped), so
    the kernel runs the packaged y4m_frames codec's full container
    walk -- header parameter parse, per-FRAME marker check,
    truncation validation -- on every row: the same decode-is-real
    discipline as dedup_phash's P6 wrap and dedup_audio_fp's RIFF
    wrap. Clips shorter than {VIDEO_FRAMES} bytes cannot form a
    frame and are excluded up front; non-single-byte (non-ASCII)
    text is excluded on BOTH engines because the engine fingerprints
    UTF-8 bytes while the oracle indexes characters -- the filter
    makes that equivalence structural instead of assumed (ADVICE
    r12; output-neutral on the all-ASCII corpus, test-pinned).

    Scale shape: one kernel pass emits {VIDEO_FRAMES} signature rows
    per clip; the candidate join is an equi-join on (frame_idx,
    frame_hash) -- only positionally-identical frames meet -- then a
    per-pair count filters to >= {VIDEO_MIN_MATCH}. FLAT frames
    (hash 0: uniform or empty spans, the only way every cell mean
    ties the frame mean) are EXCLUDED from the join on both engines
    -- they carry no perceptual signal, and on a corpus slice of many
    near-empty clips every one of them would land in the same
    (position, 0) bucket and the join would go quadratic; a clip
    therefore needs >= {VIDEO_MIN_MATCH} informative frames to be
    dedup-able at all (zero flat frames exist in the test fixtures,
    so the guard is output-neutral there -- it exists for the 100 TB
    shape). Bucket sizes are otherwise bounded by clips sharing an
    exact 24-bit frame hash at the same position."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    clips = docs.filter(
        f"doc_id % 3 = 2 AND length(encode(text, 'UTF-8')) >= {VIDEO_FRAMES}"
        " AND length(text) = length(encode(text, 'UTF-8'))"
    )
    base = clips.selectExpr("doc_id AS media_id", "text")
    twin = clips.selectExpr(
        f"doc_id + {VIDEO_TWIN_OFFSET} AS media_id",
        f"translate(text, '{_PHASH_FROM}', '{_PHASH_TO}') AS text",
    )
    fl = f"(length(encode(text, 'UTF-8')) DIV {VIDEO_FRAMES})"
    header = F.encode(
        F.concat(
            F.lit("YUV4MPEG2 W"),
            F.expr(f"CAST({fl} AS STRING)"),
            F.lit(" H1 F25:1 Ip A1:1 Cmono\n"),
        ),
        "UTF-8",
    )
    parts = [header]
    for k in range(VIDEO_FRAMES):
        parts.append(F.encode(F.lit("FRAME\n"), "UTF-8"))
        parts.append(
            F.expr(
                f"substring(encode(text, 'UTF-8'), {k} * {fl} + 1, {fl})"
            )
        )
    media = base.unionByName(twin).select(
        "media_id", F.concat(*parts).alias("payload")
    )
    # cache: both self-join sides would otherwise re-run the frame
    # kernel; flat frames dropped BEFORE the join (see docstring)
    fh = video_frame_hashes(media).filter("frame_hash != 0").cache()
    a = fh.selectExpr(
        "media_id AS a_id", "frame_idx", "frame_hash"
    )
    b = fh.selectExpr(
        "media_id AS b_id", "frame_idx", "frame_hash"
    )
    return (
        a.join(b, ["frame_idx", "frame_hash"])
        .filter("a_id < b_id")
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_match"))
        .filter(f"n_match >= {VIDEO_MIN_MATCH}")
        .orderBy("a_id", "b_id")
    )


def _dedup_video_fp_sql() -> str:
    # Mirrors the Y4M wrap: frame k is the fl-byte span starting at
    # byte offset k*fl of the text, fl = n DIV {VIDEO_FRAMES} (the
    # container holds exactly those spans as its FRAME payloads, so
    # hashing the extracted frames == hashing the spans). The
    # single-byte filter is the ADVICE-r12 guard: ascii(text[i])
    # indexes characters while the engine fingerprints UTF-8 bytes.
    nf, nb = VIDEO_FRAMES, VIDEO_FRAME_BITS
    lo = f"(k * fl)"
    cell_lo = f"({lo} + (fl * j) // {nb})"
    cell_hi = f"({lo} + (fl * (j + 1)) // {nb})"
    cell_sum = (
        f"COALESCE(list_sum(list_transform("
        f"range({cell_lo} + 1, {cell_hi} + 1), i -> ascii(text[i]))), 0)"
    )
    frame_sum = (
        f"COALESCE(list_sum(list_transform("
        f"range({lo} + 1, (k + 1) * fl + 1),"
        f" i -> ascii(text[i]))), 0)"
    )
    return f"""
WITH clip AS (
  SELECT doc_id AS media_id, text FROM documents
  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= {nf}
    AND length(text) = octet_length(encode(text))
  UNION ALL
  SELECT doc_id + {VIDEO_TWIN_OFFSET} AS media_id,
         translate(text, '{_PHASH_FROM}', '{_PHASH_TO}') AS text
  FROM documents
  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= {nf}
    AND length(text) = octet_length(encode(text))
),
px AS (
  SELECT media_id, text,
         octet_length(encode(text)) // {nf} AS fl
  FROM clip
),
fh AS (
  SELECT media_id, CAST(frames.k AS INT) AS frame_idx,
         CAST(list_sum(list_transform(range(0, {nb}), j ->
           CASE WHEN {cell_sum} * fl > {frame_sum} * ({cell_hi} - {cell_lo})
                THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT)
           AS frame_hash
  FROM px, (SELECT unnest(range({nf})) AS k) frames
)
SELECT a.media_id AS a_id, b.media_id AS b_id,
       CAST(count(*) AS BIGINT) AS n_match
FROM fh a JOIN fh b
  ON a.frame_idx = b.frame_idx AND a.frame_hash = b.frame_hash
 AND a.media_id < b.media_id
WHERE a.frame_hash != 0
GROUP BY a.media_id, b.media_id
HAVING count(*) >= {VIDEO_MIN_MATCH}
ORDER BY a_id, b_id
"""


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_frames": multimodal_frames,
    "multimodal_resize": multimodal_resize,
    "dedup_phash": dedup_phash,
    "dedup_audio_fp": dedup_audio_fp,
    "dedup_video_fp": dedup_video_fp,
}

ORACLE = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_frames": MULTIMODAL_FRAMES_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "dedup_phash": _dedup_phash_sql(),
    "dedup_audio_fp": _dedup_audio_fp_sql(),
    "dedup_video_fp": _dedup_video_fp_sql(),
}
