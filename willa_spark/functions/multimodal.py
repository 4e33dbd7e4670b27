"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition-size
control) is real and tested; the codec step itself is STUBBED because
the container ships no image/audio libraries — ``decode_image`` raises
NotImplementedError unless a deterministic fake decoder is injected
(tests use the fake). Swap in PIL/torchaudio/ffmpeg via the
``decoder=`` parameter in production.

Design notes for 100 TB of media:
- media rows are large → cap ``spark.sql.files.maxPartitionBytes`` and
  use ``maxRecordsPerBatch`` so an Arrow batch of decoded frames fits
  executor memory;
- decode → feature-extract runs in one mapInPandas pass (no shuffle);
  only the small feature vectors ever shuffle;
- metadata (width/height/duration/codec) lives in a sibling struct
  column so filters on it prune BEFORE decode (predicate pushdown
  works on parquet statistics of the struct fields).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)


def fake_image_decoder(data: bytes) -> dict:
    """Deterministic fake decode for tests: 'decodes' the byte length
    and a checksum-derived 4x4 'pixel' grid."""
    n = len(data or b"")
    checksum = sum(data or b"") % 256
    return {
        "width": 4,
        "height": 4,
        "pixels": [float((checksum + i) % 256) for i in range(16)],
        "n_bytes": n,
    }


def decode_image(data: bytes):  # pragma: no cover - intentional stub
    """Real decoder stub — the container has no image libraries.
    Inject a decoder (e.g. PIL-based) via ``decode_images(decoder=...)``."""
    raise NotImplementedError(
        "no image codec in this environment; pass decoder= to decode_images"
    )


def decode_images(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "id",
    decoder: Callable[[bytes], dict] | None = None,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode a binary image column into (id, width, height, n_bytes,
    features array) via mapInPandas. ``decoder`` defaults to the real
    (stubbed) codec; tests inject ``fake_image_decoder``."""
    import pandas as pd

    dec = decoder or decode_image
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[binary_col]):
                d = dec(bytes(blob) if blob is not None else b"")
                rows.append(
                    (rid, d["width"], d["height"], d.get("n_bytes", len(blob or b"")), d["pixels"])
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "n_bytes", "features"])

    return df.select(id_col, binary_col).mapInPandas(decode_batches, schema=out_schema)


def fake_audio_decoder(data: bytes) -> dict:
    """Deterministic fake audio decode for tests: byte length → sample
    count, checksum → a tiny PCM-like wave."""
    n = len(data or b"")
    checksum = sum(data or b"") % 128
    return {
        "sample_rate": 16_000,
        "n_channels": 1,
        "duration_ms": n,  # 1 'ms' per byte, deterministic
        "samples": [float(((checksum + i * 7) % 256) - 128) for i in range(8)],
    }


def decode_audio_stub(data: bytes):  # pragma: no cover - intentional stub
    """Real decoder stub — no audio libraries in this environment.
    Inject a decoder (e.g. soundfile/torchaudio) via
    ``decode_audio(decoder=...)``."""
    raise NotImplementedError(
        "no audio codec in this environment; pass decoder= to decode_audio"
    )


def decode_audio(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "id",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Decode a binary audio column into (id, sample_rate, n_channels,
    duration_ms, samples array) via mapInPandas — the audio counterpart
    of ``decode_images``, same single-pass no-shuffle shape."""
    import pandas as pd

    dec = decoder or decode_audio_stub
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("samples", T.ArrayType(T.DoubleType())),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[binary_col]):
                d = dec(bytes(blob) if blob is not None else b"")
                rows.append(
                    (rid, d["sample_rate"], d["n_channels"], d["duration_ms"], d["samples"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "n_channels", "duration_ms", "samples"],
            )

    return df.select(id_col, binary_col).mapInPandas(decode_batches, schema=out_schema)


def resize_features(df: DataFrame, features_col: str = "features", target: int = 4) -> DataFrame:
    """'Resize' by striding the feature grid — pure Column expression
    (slice with step) standing in for real interpolation."""
    n = F.size(F.col(features_col))
    idx = F.sequence(F.lit(0), F.lit(target - 1))
    stride = F.greatest((n / target).cast("int"), F.lit(1))
    return df.withColumn(
        "resized",
        F.transform(idx, lambda i: F.element_at(F.col(features_col), (i * stride + 1).cast("int"))),
    )


def sample_frames(
    df: DataFrame, frames_col: str = "frames", every_n: int = 10
) -> DataFrame:
    """Frame sampling for video-like array columns: keep every n-th
    element — Column-expression filter over posexplode indices."""
    return df.withColumn(
        "sampled_frames",
        F.filter(F.col(frames_col), lambda x, i: i % every_n == 0),
    )
