"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features, clearly marked) — but the Spark-side
machinery is real and tested: schemas, Arrow-batched ``mapInPandas``
signatures, partitioning by media size so one huge video doesn't skew a
task, and the metadata struct convention.

Swap ``_fake_decode`` for a real PIL/ffmpeg call on a cluster with codecs
installed; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_image(df: DataFrame, binary_col: str) -> DataFrame:
    """Real image decode — requires PIL, absent in this container."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use extract_features() for the "
            "deterministic-stub pipeline")
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

    STUB compute: without codecs the "resized" payload is a deterministic
    sha-derived placeholder of bounded size; the batch shape, schema, and
    partition behavior are the production ones — swap the inner lambda for
    a PIL ``Image.resize`` when codecs exist.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "payload": pdf[binary_col].map(
                    lambda b: hashlib.sha256(bytes(b)).digest()),
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

    STUB compute: duration derives from payload size at a nominal
    ``bytes_per_ms`` and each chunk's ``samples`` is the corresponding
    payload slice (hash-stamped) — a real build decodes PCM with
    soundfile/librosa behind the same Arrow batch shape.  Explosion
    happens inside the batch; row count scales with audio length, not
    tasks."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        step = chunk_ms * bytes_per_ms
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "start_ms": [],
                   "end_ms": [], "samples": []}
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(payload)
                n = min(max(len(payload) // step, 1), max_chunks)
                for i in range(n):
                    out["doc_id"].append(int(doc_id))
                    out["chunk_idx"].append(i)
                    out["start_ms"].append(i * chunk_ms)
                    out["end_ms"].append((i + 1) * chunk_ms)
                    sl = payload[i * step:(i + 1) * step]
                    out["samples"].append(
                        hashlib.sha256(sl + bytes([i])).digest())
            yield pd.DataFrame(out)

    prepared = df.select(F.col(id_col), F.col(binary_col).cast("binary"))
    return prepared.mapInPandas(run, schema=CHUNK_SCHEMA)
