"""Multimodal columns: images/audio/video as opaque BINARY columns with
typed metadata, processed by Arrow-batched Pandas iterators (mapInPandas).

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual media decode is STUBBED because
the image/audio libraries are not available in this container:
``decode_image`` raises NotImplementedError, and ``fake_decode_meta``
provides a deterministic stand-in so the pipeline shape can be exercised
end-to-end.

At 100 TB the rules are: keep payloads in BINARY columns (never strings),
never collect them, let mapInPandas stream Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch bounds executor memory),
and carry metadata in a separate struct column so filters/pruning work
without touching the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media corpus: the document text as a BINARY
    payload plus typed metadata (stands in for real image bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image/fake").alias("media_type"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_image(payload: bytes):
    """Real decode would go through PIL/opencv — unavailable here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this environment; "
        "use fake_decode_meta for pipeline plumbing"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode: derive (width, height, format)
    from the payload bytes."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, "fake")


N_FEATURES = 8


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: streams Arrow
    batches, never materializes the corpus. The feature vector here is a
    deterministic byte-statistics vector (the real path would run a model
    forward pass per batch — same plumbing, different math)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("batch_rows", T.IntegerType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                if arr.size == 0:
                    arr = np.zeros(1, dtype=np.float32)
                chunks = np.array_split(arr, N_FEATURES)
                feats.append([float(c.mean()) if c.size else 0.0 for c in chunks])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": feats,
                    "batch_rows": [len(pdf)] * len(pdf),
                }
            )

    return media.mapInPandas(fn, schema=out_schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: emit one row per sampled offset of the
    payload (video frame extraction shape: one input row -> many output
    rows, still Arrow-batched, payload never leaves the executor)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_byte", T.IntegerType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(i)
                    vals.append(payload[off])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_byte": vals})

    return media.mapInPandas(fn, schema=out_schema)


def downsample_payload(media: DataFrame, factor: int = 2) -> DataFrame:
    """Resize/downsample plumbing (the image-thumbnail / audio-decimate
    shape): keep every ``factor``-th byte of the payload, emit the new
    payload with its size and digest. One row in -> one (smaller) row
    out, Arrow-batched; the real path would call PIL/librosa on each
    payload — same signature, same batch shape.

    The digest makes the rewrite verifiable without shipping payloads;
    on this corpus (ASCII-derived payloads) the whole operator has a
    FULL DuckDB oracle, not just a rows-only check."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("n_bytes_out", T.LongType()),
            T.StructField("resized_md5", T.StringType()),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out = bytes(payload[::factor])
                rows.append(
                    (doc_id, out, len(out), hashlib.md5(out).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "resized", "n_bytes_out", "resized_md5"]
            )

    return media.mapInPandas(fn, schema=out_schema)
