"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two tiers of decode:

- **Real stdlib codecs** for PNG (zlib inflate + per-scanline filter
  inversion, encode + decode + nearest-neighbor resize) and WAV (the
  stdlib ``wave`` module: real frame counts, sample rates, PCM chunk
  slicing).  No native deps — these run in any Python and exercise the
  genuine parse→pixels/samples path.
- **Deterministic stubs** for everything else (JPEG/MP4/... would need
  PIL/ffmpeg, absent in this container): hash-derived fake features,
  clearly marked.  Payloads are sniffed by magic bytes, so mixed columns
  route per row.

The Spark-side machinery is identical for both tiers: schemas,
Arrow-batched ``mapInPandas`` signatures, partitioning by media size so
one huge video doesn't skew a task, and the metadata struct convention.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------------ #
# Real PNG codec (stdlib only: struct + zlib).  8-bit grayscale / RGB /
# RGBA, non-interlaced — the common deep-learning-corpus subset.
# ------------------------------------------------------------------ #

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}     # color_type -> channels


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixels: bytes,
               channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels as a real PNG.  Scanline filters cycle
    0..4 (None/Sub/Up/Average/Paeth) so a decode roundtrip exercises
    every filter inversion path."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixels length != width*height*channels")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        f = y % 5
        raw.append(f)
        if f == 0:
            raw += row
        else:
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if f == 1:
                    raw.append((row[x] - a) & 0xFF)
                elif f == 2:
                    raw.append((row[x] - b) & 0xFF)
                elif f == 3:
                    raw.append((row[x] - (a + b) // 2) & 0xFF)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    raw.append((row[x] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def png_meta(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, channels) from the IHDR — cheap header
    parse, no inflate."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    if payload[12:16] != b"IHDR":
        raise ValueError("first chunk is not IHDR")
    w, h, depth, color_type = struct.unpack(">IIBB", payload[16:26])
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    return w, h, depth, _PNG_CHANNELS[color_type]


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full decode: (width, height, channels, raw pixels).  Real work —
    IDAT inflate + scanline filter inversion (PNG spec §6: None, Sub,
    Up, Average, Paeth)."""
    w, h, depth, channels = png_meta(payload)
    if depth != 8:
        raise ValueError("only 8-bit supported")
    idat = bytearray()
    off = 8
    while off < len(payload):
        (ln,) = struct.unpack(">I", payload[off:off + 4])
        tag = payload[off + 4:off + 8]
        if tag == b"IDAT":
            idat += payload[off + 8:off + 8 + ln]
        off += 12 + ln
        if tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("scanline data size mismatch")
    out = bytearray(stride * h)
    prev = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif f == 2:
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
        elif f == 4:
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return w, h, channels, bytes(out)


def resize_nearest(pixels: bytes, w: int, h: int, channels: int,
                   out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of raw 8-bit pixels."""
    out = bytearray(out_w * out_h * channels)
    for j in range(out_h):
        sy = j * h // out_h
        for i in range(out_w):
            sx = i * w // out_w
            so = (sy * w + sx) * channels
            do = (j * out_w + i) * channels
            out[do:do + channels] = pixels[so:so + channels]
    return bytes(out)


# ------------------------------------------------------------------ #
# Real WAV codec (stdlib wave module).
# ------------------------------------------------------------------ #

WAV_SIG = b"RIFF"


def encode_wav(samples: bytes, rate: int = 8000, channels: int = 1,
               sampwidth: int = 2) -> bytes:
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(samples)
    return buf.getvalue()


def wav_meta(payload: bytes) -> tuple[int, int, int, int, int]:
    """(n_frames, rate, channels, sampwidth, duration_ms) — real header
    parse via the stdlib ``wave`` reader."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        n, rate = w.getnframes(), w.getframerate()
        return (n, rate, w.getnchannels(), w.getsampwidth(),
                n * 1000 // rate)

#: metadata struct carried beside every media binary column
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),    # image|audio|video
    T.StructField("format", T.StringType()),        # png|wav|mp4|...
    T.StructField("size_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),        # images/video
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),     # audio/video
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("size_bytes", T.LongType()),
    T.StructField("sha_prefix", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    pass


def _fake_decode(payload: bytes, n_features: int = 8) -> list[float]:
    """DETERMINISTIC FAKE feature extractor (stand-in for a real decoder).

    Derives n float features from byte statistics so tests are stable.
    Replace with a real decode (PIL/librosa/ffmpeg) in production — the
    mapInPandas batch shape is identical.
    """
    import hashlib
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(n_features)]


def attach_media_meta(df: DataFrame, binary_col: str,
                      media_type: str = "image",
                      fmt: str = "bin") -> DataFrame:
    """Attach the typed metadata struct computed from the payload (size is
    real; shape fields are decoder's job and stay null in the stub)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def extract_features(df: DataFrame, id_col: str, binary_col: str,
                     n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    ``mapInPandas`` so each task processes whole Arrow record batches
    (decode is per-row CPU work — exactly the case where pandas UDFs are
    the right tool).  Repartitioning by size-bucket upstream avoids one
    task owning all the large payloads.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "size_bytes": payloads.map(len).astype("int64"),
                "sha_prefix": payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest()[:16]),
                "feature": payloads.map(
                    lambda b: _fake_decode(bytes(b), n_features)),
            })

    prepared = df.select(F.col(id_col).alias(id_col),
                         F.col(binary_col).cast("binary").alias(binary_col))
    return prepared.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("n_px", T.LongType()),
])


def decode_images(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """REAL image decode over Arrow batches — PNG via the stdlib codec
    above (inflate + filter inversion), no PIL needed.  Emits actual
    parsed dimensions plus exact pixel-sum/count (oracle-friendly
    integers; mean = px_sum / n_px).  Non-PNG payloads raise — JPEG &
    co. need PIL, absent here (sniff with ``payload[:8]`` upstream)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODED_IMAGE_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                w, h, ch, px = decode_png(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["px_sum"].append(sum(px))
                out["n_px"].append(len(px))
            yield pd.DataFrame(out)

    prepared = df.select(F.col(id_col), F.col(binary_col).cast("binary"))
    return prepared.mapInPandas(run, schema=DECODED_IMAGE_SCHEMA)


def decode_image(df: DataFrame, binary_col: str) -> DataFrame:
    """Legacy entry: real PNG decode is :func:`decode_images`; other
    formats (JPEG/WebP/…) require PIL, absent in this container."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "non-PNG image decode requires PIL; PNG decodes for real via "
            "decode_images()")
    raise NotImplementedError("real decoder wiring lands with codec support")


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(df: DataFrame, id_col: str, binary_col: str,
                  width: int, height: int) -> DataFrame:
    """Image resize over Arrow batches (``mapInPandas``).

    Payloads are sniffed per row: PNGs take the REAL path — stdlib
    decode (inflate + filter inversion) → nearest-neighbor resample →
    re-encode, so the output payload is a valid PNG of the target size.
    Anything else keeps the deterministic sha-derived stub (JPEG & co.
    would need PIL); batch shape, schema, and partition behavior are
    identical either way.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def one(b: bytes) -> bytes:
            if b[:8] == PNG_SIG:
                w, h, ch, px = decode_png(b)
                return encode_png(width, height,
                                  resize_nearest(px, w, h, ch,
                                                 width, height), ch)
            return hashlib.sha256(b).digest()

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "payload": pdf[binary_col].map(lambda b: one(bytes(b))),
                "width": width,
                "height": height,
            })

    prepared = df.select(F.col(id_col), F.col(binary_col).cast("binary"))
    return prepared.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(df: DataFrame, id_col: str, binary_col: str,
                  every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (``mapInPandas`` UDTF shape — the flat_map of SURVEY §2.2 over media).

    STUB compute: frame count is derived from payload size and each "frame"
    is a deterministic slice-hash; a real build decodes with ffmpeg/pyav.
    Explosion happens inside the Arrow batch (no driver involvement), so
    output row count scales with frames, not tasks.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(payload)
                n = min(max(len(payload) // (every_n * 16), 1), max_frames)
                for i in range(n):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame"].append(
                        hashlib.sha256(payload + bytes([i])).digest())
            yield pd.DataFrame(out)

    prepared = df.select(F.col(id_col), F.col(binary_col).cast("binary"))
    return prepared.mapInPandas(run, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("chunk_idx", T.IntegerType()),
    T.StructField("start_ms", T.LongType()),
    T.StructField("end_ms", T.LongType()),
    T.StructField("samples", T.BinaryType()),
])


def chunk_audio(df: DataFrame, id_col: str, binary_col: str,
                chunk_ms: int = 1000, bytes_per_ms: int = 16,
                max_chunks: int = 6) -> DataFrame:
    """Audio windowing: one output row per fixed-duration chunk — the
    audio analog of :func:`sample_frames` (the reference's media columns
    are opaque payloads + typed metadata; SURVEY §2.2 flat_map shape).

    Payloads are sniffed per row.  RIFF/WAV takes the REAL path: the
    stdlib ``wave`` reader parses actual frame counts and sample rates,
    ``start_ms``/``end_ms`` come from the true timeline, and ``samples``
    are the raw PCM frame slices.  Anything else keeps the deterministic
    stub (duration from payload size at a nominal ``bytes_per_ms``,
    hash-stamped slices) — compressed audio would need soundfile/
    librosa.  Explosion happens inside the Arrow batch either way; row
    count scales with audio length, not tasks."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io
        import wave
        step = chunk_ms * bytes_per_ms
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "start_ms": [],
                   "end_ms": [], "samples": []}

            def emit(doc_id, i, s, e, sl):
                out["doc_id"].append(int(doc_id))
                out["chunk_idx"].append(i)
                out["start_ms"].append(s)
                out["end_ms"].append(e)
                out["samples"].append(sl)

            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(payload)
                if payload[:4] == WAV_SIG:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        rate, nch = w.getframerate(), w.getnchannels()
                        width_b = w.getsampwidth()
                        frames = w.readframes(w.getnframes())
                    fpc = rate * chunk_ms // 1000        # frames/chunk
                    bpf = nch * width_b                  # bytes/frame
                    n_frames = len(frames) // bpf
                    n = min(max(-(-n_frames // fpc), 1), max_chunks)
                    for i in range(n):
                        f0, f1 = i * fpc, min((i + 1) * fpc, n_frames)
                        emit(doc_id, i, f0 * 1000 // rate,
                             f1 * 1000 // rate,
                             frames[f0 * bpf:f1 * bpf])
                    continue
                n = min(max(len(payload) // step, 1), max_chunks)
                for i in range(n):
                    sl = payload[i * step:(i + 1) * step]
                    emit(doc_id, i, i * chunk_ms, (i + 1) * chunk_ms,
                         hashlib.sha256(sl + bytes([i])).digest())
            yield pd.DataFrame(out)

    prepared = df.select(F.col(id_col), F.col(binary_col).cast("binary"))
    return prepared.mapInPandas(run, schema=CHUNK_SCHEMA)
