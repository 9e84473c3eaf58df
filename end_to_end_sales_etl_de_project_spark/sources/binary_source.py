"""Raw binary-file ingestion → the multimodal asset table.

The front door of the multimodal pipeline (SURVEY north-star: treat
image/audio/video as opaque binary columns with typed metadata): a
directory of raw files becomes the same (asset_id, payload, meta)
shape that ``operators/multimodal.py`` consumes, via Spark's built-in
``binaryFile`` source — distributed file listing + content read, no
driver-side I/O loop.

Scale notes:

- A ``binaryFile`` row is one whole file — rows never split across
  tasks, so parallelism is file-count-bound. ``min_partitions``
  repartitions after the scan for downstream decode stages when the
  listing produced few large files.
- Files larger than ``spark.sql.sources.binaryFile.maxLength`` (2 GiB
  default ceiling — DataFrame binary columns cannot exceed it) fail
  loudly rather than truncate; shard oversized media upstream.
- ``asset_id`` is derived from the file path via the portable 60-bit
  md5 (`functions/hashing.py`) — stable across runs and cluster
  layouts, unlike ``monotonically_increasing_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.functions.hashing import h60

# extension → asset format tag (lowercased); unknown extensions keep
# the extension itself so nothing is silently dropped or mislabeled
_FORMAT_BY_EXT = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "gif": "image",
    "wav": "audio",
    "mp3": "audio",
    "flac": "audio",
    "mp4": "video",
    "mkv": "video",
    "txt": "txt",
}


def read_binary_assets(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
    source: str = "files",
    min_partitions: int | None = None,
) -> DataFrame:
    """Read raw files under ``path`` into the asset-table shape
    ``(asset_id long, payload binary, meta struct<format, source,
    n_bytes>)`` plus lineage columns ``(asset_path, modified_at)``.

    ``glob`` maps to ``pathGlobFilter`` (pushed into the distributed
    listing, e.g. ``"*.png"``); ``recursive`` to
    ``recursiveFileLookup``. ``min_partitions`` optionally spreads few
    large files across more tasks for the decode stage — a true
    MINIMUM (ADVICE r5): when the scan already produced at least that
    many partitions, no repartition (and no full shuffle of the binary
    payloads) happens.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    fmt = F.coalesce(
        *[F.when(ext == e, F.lit(tag)) for e, tag in _FORMAT_BY_EXT.items()],
        F.when(ext == "", F.lit("bin")),
        ext,
    )
    assets = raw.select(
        h60(F.col("path")).alias("asset_id"),
        F.col("content").alias("payload"),
        F.struct(
            fmt.alias("format"),
            F.lit(source).alias("source"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
        F.col("path").alias("asset_path"),
        F.col("modificationTime").alias("modified_at"),
    )
    if min_partitions is not None and assets.rdd.getNumPartitions() < min_partitions:
        assets = assets.repartition(min_partitions)
    return assets
