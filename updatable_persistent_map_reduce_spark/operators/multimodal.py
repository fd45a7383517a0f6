"""Tier B — multimodal column plumbing.

Images/audio/video at 100 TB are opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched Python over ``mapInPandas`` (the libs live on the
executors, never the driver). This container ships no image/audio
codecs, so the decode kernel here is a clearly-marked deterministic
fake over real bytes — everything Spark-side (binary column, metadata
struct, Arrow batch shape, UDF signature, partitioning) is the real
production plumbing and is oracle-checked.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at/below default so a partition
of blobs fits executor memory; metadata-only queries must prune the
binary column (columnar parquet reads skip it entirely); decode is a
per-partition map (no shuffle) and the Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds peak memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import Catalog
from . import register


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: no codec libraries in this container.

    Production: ``PIL.Image.open(io.BytesIO(payload))`` (or
    torchvision/ffmpeg for video frame-sampling) inside the same
    mapInPandas kernel shape as :func:`_fake_decode_batch` below.
    """
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "use the deterministic fake kernel (q_mm_features) which "
        "exercises identical Spark plumbing"
    )


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake 'decode + feature extract' over real bytes:
    byte length, first byte, checksum of the first 16 bytes. Stands in
    for decode_image(); identical Arrow-batch shape and signature."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "checksum16": payloads.map(
                    lambda b: sum(b[:16]) % 256
                ).astype("int32"),
            }
        )


@register(
    "q_mm_features",
    oracle=(
        "SELECT doc_id, "
        "CAST((doc_id * 37) % 640 + 1 AS INTEGER) AS width, "
        "CAST((doc_id * 13) % 480 + 1 AS INTEGER) AS height, "
        "CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, "
        "CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte, "
        "CAST(list_reduce(list_prepend(0, list_transform("
        "list_filter(string_split(substr(text, 1, 16), ''), c -> c <> ''), "
        "c -> ascii(c))), (a, c) -> a + c) % 256 AS INTEGER) AS checksum16 "
        "FROM documents"
    ),
    doc="Multimodal pipeline plumbing: binary payload column + typed "
    "metadata struct -> Arrow-batched mapInPandas 'decode' kernel "
    "(deterministic fake; see decode_image stub) -> per-item features. "
    "No shuffle; pure per-partition map.",
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    with_payload = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        ((F.col("doc_id") * 37) % 640 + 1).cast("int").alias("width"),
        ((F.col("doc_id") * 13) % 480 + 1).cast("int").alias("height"),
    )
    return with_payload.mapInPandas(
        _fake_decode_batch,
        schema=(
            "doc_id long, width int, height int, n_bytes int, "
            "first_byte int, checksum16 int"
        ),
    )
