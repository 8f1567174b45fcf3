"""Multimodal column plumbing (north-star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
mapInPandas stages.

The decode step itself is STUBBED — the real codecs (PIL/ffmpeg/soundfile)
are not in this container.  ``decode_image`` raises NotImplementedError
unless PIL is importable; the deterministic fake used by the queries
derives metadata from the payload's sha256, so the Spark-side plumbing —
binary schema, batch shapes, 1→N frame expansion, partitioning — is real
and tested while the codec is swappable.

Scale note: binary payloads never pass through Python row-by-row; they
move as Arrow buffers into pandas batches.  At 100 TB the payloads live
in parquet binary columns (or file paths + range reads, as in
dirhash.chunks) and each mapInPandas task handles one partition's worth.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import Catalog
from ..registry import query

_FORMATS = ("png", "jpeg", "webp")


def decode_image(payload: bytes) -> dict:
    """Real decode path — requires an image codec library.

    STUB: PIL is not available in this environment; callers that need
    true pixel data must install it.  The query pipeline uses
    :func:`fake_decode` (deterministic, codec-free) instead.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/Pillow, not present in this container; "
            "use fake_decode for plumbing tests"
        ) from exc
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return {"width": img.width, "height": img.height, "format": (img.format or "").lower()}


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in: metadata derived from the payload digest,
    so every engine/run agrees without a codec."""
    d = hashlib.sha256(payload).digest()
    return {
        "width": 16 + d[0] % 240,
        "height": 16 + d[1] % 240,
        "format": _FORMATS[d[2] % len(_FORMATS)],
    }


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha256", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("format", StringType(), False),
    ]
)


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "n_bytes", "payload_sha256", "width", "height", "format")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            meta = fake_decode(payload)
            rows["doc_id"].append(int(doc_id))
            rows["n_bytes"].append(len(payload))
            rows["payload_sha256"].append(hashlib.sha256(payload).hexdigest())
            rows["width"].append(meta["width"])
            rows["height"].append(meta["height"])
            rows["format"].append(meta["format"])
        yield pd.DataFrame(rows)


def binary_table(cat: Catalog) -> DataFrame:
    """documents → (doc_id, payload BINARY): the opaque-blob table shape
    (payload = UTF-8 bytes of the text, standing in for media bytes).
    Repartitioned so the downstream decode stages parallelize even when
    the source is a single small file."""
    n_parts = cat.spark.sparkContext.defaultParallelism
    return cat.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).repartition(n_parts)


@query("mm_meta_extract", oracle=None, tags=("multimodal",))
def mm_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction over a binary column via Arrow-batched
    mapInPandas (decode stubbed deterministically; see module doc)."""
    cat = Catalog(spark, sf_dir)
    return binary_table(cat).mapInPandas(_extract_meta, _META_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_sha256", StringType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1→N expansion: treat the payload as a 'video', emit every k-th
    fixed-size slice as a 'frame' (deterministic sampling)."""
    frame_size, stride = 64, 4
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "frame_idx", "frame_sha256", "frame_bytes")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            n_frames = max(len(payload) // frame_size, 1)
            for idx in range(0, n_frames, stride):
                frame = payload[idx * frame_size : (idx + 1) * frame_size]
                rows["doc_id"].append(int(doc_id))
                rows["frame_idx"].append(idx)
                rows["frame_sha256"].append(hashlib.sha256(frame).hexdigest())
                rows["frame_bytes"].append(frame)
        yield pd.DataFrame(rows)


@query("mm_frame_sample", oracle=None, tags=("multimodal",))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (every 4th 64-byte slice) —
    the video-frame-extraction batch shape with a stubbed codec."""
    cat = Catalog(spark, sf_dir)
    return binary_table(cat).mapInPandas(_sample_frames, _FRAME_SCHEMA)
