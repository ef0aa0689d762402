"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The Spark-side architecture here is the real thing — schema contracts,
batch iteration, partition-preserving feature extraction; only the
codec itself is stubbed (this environment ships no PIL/ffmpeg — see
``decode_image``). The stubs are deterministic byte-level functions so
the whole path is testable and oracle-checkable; swapping in a real
codec changes one function body, not the pipeline.

Scale notes:
- payloads stay columnar Arrow buffers end-to-end; never .collect()
  media to the driver.
- mapInPandas streams record batches, so per-executor memory is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x mean
  payload size — lower that conf (e.g. 64) for multi-MB media rows.
- feature extraction is embarrassingly parallel: no shuffle at all;
  partition count = scan partitions of the payload source.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only needed inside executors at runtime
    import pandas as pd

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("byte_sum_mod", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires PIL/libjpeg, absent in this
    container. The pipeline around it (binary column -> mapInPandas ->
    feature rows) is fully functional with the deterministic stub
    features below."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use extract_media_features (deterministic byte-level features)"
    )


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque media payload with
    typed metadata — the storage contract a real pipeline uses for
    image/audio blobs (payload binary + metadata struct)."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def extract_media_features(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic byte-level "decode": payload size, first-4-byte header
    hex (what a real magic-number sniffer reads), and a byte-sum
    checksum mod 997 (stand-in for pixel statistics). Each is exactly
    reproducible in SQL, so the whole mapInPandas path sits under the
    correctness gate."""

    def features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "header_hex": payloads.map(lambda b: b[:4].hex()),
                    "byte_sum_mod": payloads.map(
                        lambda b: sum(b) % 997
                    ).astype("int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        features, schema=MEDIA_FEATURES_SCHEMA
    )


MEDIA_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frame_bytes(
    media: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-content sampling (video stand-in): split each payload into
    ``n_frames`` contiguous chunks — frame f covers bytes
    [len*f//n, len*(f+1)//n). One mapInPandas stage, no shuffle; a real
    pipeline swaps the byte slicing for ffmpeg keyframe extraction with
    the identical (id, frame_idx, frame_bytes) contract."""

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                n = len(b)
                for f in range(n_frames):
                    ids.append(i)
                    idxs.append(f)
                    chunks.append(bytes(b[n * f // n_frames : n * (f + 1) // n_frames]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": chunks}
            )

    return media.select(id_col, payload_col).mapInPandas(
        frames, schema=MEDIA_FRAMES_SCHEMA
    )


def resize_media(
    media: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize (image stand-in): deterministic byte striding to a fixed
    ``out_w x out_h`` payload — output byte j is input byte
    ``len*j // (w*h)`` (nearest-neighbor downsampling over the byte
    stream; empty payloads stay empty). Same mapInPandas contract a
    PIL-backed resize would use: binary in, fixed-size binary out,
    partition-preserving, no shuffle."""
    out_n = out_w * out_h

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            def _one(b: bytes) -> bytes:
                n = len(b)
                if n == 0:
                    return b""
                return bytes(b[n * j // out_n] for j in range(out_n))

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "resized": pdf[payload_col].map(_one),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        resize, schema="doc_id long, resized binary"
    )


def grouped_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group z-score via grouped-map ``applyInPandas`` — the third
    Arrow surface (mapInPandas: stateless stream; applyInPandasWithState:
    streaming state; this: whole-group pandas logic).

    The z-score itself is SQL-expressible (that is what puts this path
    under the oracle gate); the pattern is for group-level Python that
    is NOT — per-group model scoring, sklearn transforms, etc.

    Scale: one shuffle on the group key; each group must fit in one
    executor's pandas frame — keep groups bounded (language/source
    partitions, not the whole corpus)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(group_col, T.StringType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def z(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        v = pdf[value_col].astype("float64")
        std = v.std(ddof=0)
        zs = (v - v.mean()) / std if std > 0 else v * 0.0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "zscore": zs.round(6),
            }
        )

    return df.select(id_col, group_col, value_col).groupBy(group_col).applyInPandas(
        z, schema=out_schema
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame index. The frame *count* derives from metadata
    (duration), the decode of each frame is stubbed — but the explode
    shape, schema, and per-row lineage are the real pipeline.

    Fake duration = n_bytes ms, so frame_idx = 0..n_bytes/every_ms."""
    n_frames = (F.octet_length(F.col(payload_col)) / every_ms).cast("int") + 1
    return media.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ms", F.col("frame_idx") * every_ms)
