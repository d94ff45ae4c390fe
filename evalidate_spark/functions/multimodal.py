"""Multimodal column plumbing — image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed through Arrow-batched
``mapInPandas`` UDFs.

The Spark side is real and tested: schemas, batch iteration, partition
sizing, UDF signatures.  The codec step itself is a **deterministic stub**
(``decode_stub``) because no image/audio libraries exist in this sandbox —
swap ``_decode_payload`` for PIL/torchaudio/ffmpeg in production; nothing
else changes.

Scale notes: payload bytes never pass through the driver, never join, and
never shuffle — feature extraction is a map-only stage.  Keep
``spark.sql.files.maxPartitionBytes`` modest (128 MB default) so a
partition of payloads fits executor memory; Arrow batch size is capped via
``spark.sql.execution.arrow.maxRecordsPerBatch`` for very large payloads.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def _decode_payload(kind: str, payload: bytes) -> dict:
    """STUB — deterministic fake decode.  In production this is the only
    function to replace (PIL for images, soundfile/torchaudio for audio,
    pyav/ffmpeg frame sampling for video).  The fake derives stable
    pseudo-dimensions from the payload hash so tests are reproducible."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    if kind == "image":
        return {"width": 64 + h[0], "height": 64 + h[1], "duration_ms": None}
    if kind == "audio":
        return {"width": None, "height": None, "duration_ms": 1000 + int.from_bytes(h[2:4], "big")}
    if kind == "video":
        return {"width": 64 + h[0], "height": 64 + h[1], "duration_ms": 1000 + int.from_bytes(h[2:4], "big")}
    raise NotImplementedError(f"unknown media kind {kind!r}")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a media table
    (:data:`MEDIA_SCHEMA`-shaped) → :data:`FEATURE_SCHEMA` rows.

    ``mapInPandas`` — one Python worker per partition, pandas batches in,
    pandas batches out; payload stays columnar Arrow end-to-end."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            decoded = [
                _decode_payload(k, p if p is not None else b"")
                for k, p in zip(pdf["media_kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "width": pd.array([d["width"] for d in decoded], dtype="Int32"),
                    "height": pd.array([d["height"] for d in decoded], dtype="Int32"),
                    "duration_ms": pd.array([d["duration_ms"] for d in decoded], dtype="Int32"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payloads through ``mapInPandas`` with the target
    dims recorded in ``meta`` (real impl: decode→resize→re-encode in the
    same batch loop).  Proves the binary-in/binary-out batch path."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            meta = [
                {**(m if isinstance(m, dict) else {}), "resize": f"{width}x{height}"}
                for m in pdf["meta"]
            ]
            out = pdf.copy()
            out["meta"] = meta
            yield out

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB video frame sampling: emits one row per sampled frame with a
    deterministic frame payload (real impl: pyav keyframe iteration).
    Demonstrates the 1→N ``mapInPandas`` row-expansion shape."""
    import hashlib

    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("frame_ix", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            refs, ixs, tss, shas = [], [], [], []
            for ref, kind, payload in zip(pdf["media_ref"], pdf["media_kind"], pdf["payload"]):
                if kind != "video":
                    continue
                dur = _decode_payload(kind, payload if payload is not None else b"")["duration_ms"]
                for ix, ts in enumerate(range(0, dur, every_ms)):
                    refs.append(ref)
                    ixs.append(ix)
                    tss.append(ts)
                    shas.append(
                        hashlib.sha256((payload or b"") + ts.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame({"media_ref": refs, "frame_ix": ixs, "ts_ms": tss, "frame_sha": shas})

    return media.mapInPandas(batches, schema=schema)


def synth_media(spark, n: int = 100, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table (payload = repeated xxhash bytes)
    for tests/benchmarks — no external data."""
    i = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(i), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat_ws("-", *[F.conv(F.xxhash64(i, F.lit(j)).cast("string"), 10, 16) for j in range(4)]),
        "utf-8",
    )
    return spark.range(0, n, numPartitions=partitions).select(
        F.concat(F.lit("m-"), i.cast("string")).alias("media_ref"),
        kind.alias("media_kind"),
        payload.alias("payload"),
        F.create_map(F.lit("src"), F.lit("synth")).alias("meta"),
    )
