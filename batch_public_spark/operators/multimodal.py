"""Multimodal column support (north-star op, BASELINE.json).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (``mime``, ``width``, ``height``,
``duration_s``). All Spark-side plumbing — schema, partition sizing, Arrow
batch shape, UDF signatures — is real and tested; the actual codec work is
STUBBED (this container has no image/audio libraries): ``decode_features``
raises ``NotImplementedError`` in ``strict`` mode and otherwise computes a
deterministic fake feature vector (byte histogram), which keeps tests and
benchmarks honest about data movement without pretending to decode JPEGs.

Scale notes: binary payloads dominate row size — ``mapInPandas`` receives
Arrow record batches, so ``spark.sql.execution.arrow.maxRecordsPerBatch``
(and parquet row-group sizing on write) is the lever that keeps executor
memory bounded at 100 TB; feature extraction is embarrassingly parallel and
shuffle-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MULTIMODAL_META_SCHEMA = (
    "struct<mime string, width int, height int, duration_s double>"
)

FEATURE_DIM = 16


def pack_blob(payload: Column, mime: Column) -> Column:
    """Assemble the canonical (blob, meta) pair from raw bytes + mime."""
    return F.struct(
        payload.alias("data"),
        F.struct(
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )


def synthesize_blobs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary fixtures: utf-8 bytes of the text standing in
    for media payloads (the driver testdata has no real media)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.lit("application/octet-stream").alias("mime"),
    )


def blob_metadata(blob: Column) -> Column:
    """Cheap, engine-parity metadata: byte length + content digests —
    computable without any codec."""
    return F.struct(
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("md5"),
        F.sha2(blob, 256).alias("sha256"),
    )


def decode_features(
    df: DataFrame,
    *,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    strict: bool = False,
    batch_hint: int = 256,
) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    ``mapInPandas``.

    ``strict=True`` is the real-decoder path — it raises
    ``NotImplementedError`` here (no PIL/ffmpeg in this container) exactly
    where a production build would call the codec. The default path emits a
    deterministic 16-bin byte histogram (L1-normalized) so downstream
    similarity/clustering plumbing is exercised with stable numbers.
    """
    from batch_public_spark.util import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)

    schema = f"{id_col} long, n_bytes long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if strict:
            raise NotImplementedError(
                "real media decode requires image/audio codecs not present in "
                "this environment; run with strict=False for the deterministic stub"
            )
        for pdf in batches:
            ids, lens, feats = [], [], []
            for rid, blob in zip(pdf[id_col].to_numpy(), pdf[blob_col].to_numpy()):
                raw = bytes(blob) if blob is not None else b""
                arr = np.frombuffer(raw, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                total = float(hist.sum()) or 1.0
                ids.append(rid)
                lens.append(len(raw))
                feats.append((hist / total).tolist())
            for i in range(0, len(ids), batch_hint):
                yield pd.DataFrame(
                    {
                        id_col: ids[i : i + batch_hint],
                        "n_bytes": lens[i : i + batch_hint],
                        "features": feats[i : i + batch_hint],
                    }
                )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    *,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Frame sampling over binary media payloads: one output row per
    sampled frame (UDTF shape — rows multiply), via Arrow-batched
    ``mapInPandas``.

    ``strict=True`` is where a production build seeks the container
    (ffmpeg) and decodes every k-th frame; absent codecs it raises. The
    deterministic fake treats the payload as a raw byte stream and emits
    consecutive ``frame_bytes`` slices with their digests — the row
    explosion, batch shape, and downstream join/agg plumbing are exactly
    the real pipeline's.

    Scale: sampling is per-row work with multiplicative output — the
    Arrow batch size bounds peak memory, and emitting digests/features
    instead of raw frame bytes keeps the shuffle payload small when the
    caller aggregates (the fake emits the digest for that reason).
    """
    from batch_public_spark.util import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)

    schema = f"{id_col} long, frame_idx long, frame_len long, frame_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        if strict:
            raise NotImplementedError(
                "real frame sampling requires video codecs not present in "
                "this environment; run with strict=False for the byte-slice stub"
            )
        for pdf in batches:
            id_parts, idx_parts, len_parts, digests = [], [], [], []
            for rid, blob in zip(pdf[id_col].to_numpy(), pdf[blob_col].to_numpy()):
                raw = bytes(blob) if blob is not None else b""
                total = len(raw)
                n = max((total + frame_bytes - 1) // frame_bytes, 1)
                n_full = total // frame_bytes
                # Vectorized slicing: one frombuffer+reshape gives every
                # full frame as a contiguous row — no per-chunk Python
                # slicing. md5 reads each row via the buffer protocol.
                full = np.frombuffer(
                    raw, dtype=np.uint8, count=n_full * frame_bytes
                ).reshape(n_full, frame_bytes)
                row_digests = [hashlib.md5(f).hexdigest() for f in full]
                lens = np.full(n, frame_bytes, dtype=np.int64)
                if n > n_full:  # trailing partial frame (or empty payload)
                    tail = raw[n_full * frame_bytes :]
                    row_digests.append(hashlib.md5(tail).hexdigest())
                    lens[-1] = len(tail)
                id_parts.append(np.full(n, rid, dtype=np.int64))
                idx_parts.append(np.arange(n, dtype=np.int64))
                len_parts.append(lens)
                digests.extend(row_digests)
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(id_parts) if id_parts else np.array([], dtype=np.int64),
                    "frame_idx": np.concatenate(idx_parts) if idx_parts else np.array([], dtype=np.int64),
                    "frame_len": np.concatenate(len_parts) if len_parts else np.array([], dtype=np.int64),
                    "frame_md5": digests,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def resize_image(
    df: DataFrame,
    *,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    width: int = 32,
    height: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Image resize plumbing: binary in → binary out with updated typed
    metadata, via ``mapInPandas``.

    ``strict=True`` is the PIL/libvips call site (raises here). The fake
    emits a payload of exactly ``width*height`` bytes (truncate or
    zero-pad) so byte-budget accounting downstream — parquet row-group
    sizing, Arrow batch memory — behaves like a real thumbnail pipeline.
    """
    from batch_public_spark.util import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)

    target = width * height
    schema = f"{id_col} long, resized binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image resize requires codecs not present in this "
                "environment; run with strict=False for the size-exact stub"
            )
        for pdf in batches:
            ids, blobs = [], []
            for rid, blob in zip(pdf[id_col].to_numpy(), pdf[blob_col].to_numpy()):
                raw = bytes(blob) if blob is not None else b""
                ids.append(rid)
                blobs.append(raw[:target].ljust(target, b"\0"))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "resized": blobs,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)
