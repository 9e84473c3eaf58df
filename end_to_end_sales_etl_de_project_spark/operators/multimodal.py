"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with feature extraction over Arrow-batched ``mapInPandas``.

A 100 TB training pipeline carries images/audio/video as ``binary``
columns with a metadata struct; decode/resize/frame-sample run as
vectorized Python over Arrow batches. The decode libraries (PIL,
ffmpeg, torchaudio, …) are NOT in this container, so the actual decode
step is STUBBED — ``decode_stub=True`` computes deterministic
byte-level features; plugging a real decoder is the marked TODO in
``_extract_features``. Everything around the stub — schema, batch
iteration, partition sizing, output contract — is real and tested.

Scale notes: payload bytes never leave the executor (features are
computed in place); Arrow batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB
payloads set it low (e.g. 64) so a batch stays within worker memory.
The asset table should be written with a small
``spark.sql.files.maxPartitionBytes`` relative to row size for even
task sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy_proxy", T.LongType()),
    ]
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Stand-in asset table: utf-8 text bytes as the opaque payload
    (the container has no image/audio corpus; the column shapes are
    what matter)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("txt").alias("format"),
            F.col("source").alias("source"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Per-asset feature extraction via ``mapInPandas``.

    With ``decode_stub=False`` this raises NotImplementedError from the
    workers — the seam where a real decoder (PIL/librosa/pyav) goes.
    The UDF is a closure: pickled by value, no PYTHONPATH requirement
    on workers.
    """

    def feature_batches(batches):
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires an image/audio library; "
                    "this environment ships none (stub only)"
                )
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # deterministic byte-level "features" standing in for
                    # decoded-content features
                    "byte_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_entropy_proxy": payloads.map(
                        lambda b: len(set(b))
                    ).astype("int64"),
                }
            )
            yield out

    return assets.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_id", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    frame_size: int = 256,
    hop: int = 1024,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling over opaque payloads via ``mapInPandas`` — the
    1:N fan-out shape of video frame extraction (one asset row in, one
    row per sampled frame out), which ``m02``'s 1:1 feature map cannot
    express.

    With the stub, a "frame" is the ``frame_size``-byte window at every
    ``hop``-th offset (deterministic byte math standing in for decoded
    frames); a real pipeline swaps the window loop for pyav/ffmpeg
    keyframe extraction at the marked seam. Assets shorter than one
    frame emit a single truncated frame, and any tail bytes beyond the
    last full frame emit a final truncated frame — every asset's end
    stays visible downstream, so the checksum column can detect loss
    or truncation at either end of the payload. The UDF is a closure (pickled by value); payload bytes
    never leave the executor, and the output carries its own checksum
    so a lost/duplicated frame is detectable after any downstream
    shuffle.
    """

    def frame_batches(batches):
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction requires a video library; "
                    "this environment ships none (stub only)"
                )
            cols: dict[str, list] = {k: [] for k in (
                "asset_id", "frame_id", "frame_offset", "frame_bytes", "frame_checksum"
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                if len(b) >= frame_size:
                    offsets = list(range(0, len(b) - frame_size + 1, hop))
                    # tail beyond the last full frame: truncated final
                    # frame (consistent with the short-payload case)
                    tail = offsets[-1] + frame_size
                    if tail < len(b):
                        offsets.append(tail)
                else:
                    offsets = [0]
                for fid, off in enumerate(offsets):
                    fr = b[off : off + frame_size]
                    cols["asset_id"].append(aid)
                    cols["frame_id"].append(fid)
                    cols["frame_offset"].append(off)
                    cols["frame_bytes"].append(fr)
                    cols["frame_checksum"].append(sum(fr) % (1 << 31))
            yield pd.DataFrame(cols)

    return assets.mapInPandas(frame_batches, schema=FRAME_SCHEMA)
