"""Multimodal-column plumbing: opaque binary payloads with typed metadata,
decoded/feature-extracted via Arrow-batched Pandas functions.

The container has no image/audio libraries, so the *decode* step is
stubbed two ways (per the build contract):

- ``decode_image``/``decode_audio`` raise ``NotImplementedError`` with a
  clear message unless the optional library (Pillow/soundfile) is
  importable — the real integration point, import-gated.
- ``byte_stats_features`` is a deterministic fake decoder (byte-level
  statistics of the payload) that exercises the REAL Spark plumbing:
  binary column -> mapInPandas with Arrow batches -> typed feature
  columns. Swapping the fake for a real decoder changes one pandas
  function body, not the plan.

Scale notes: payload bytes ride the shuffle only if you shuffle them —
feature extraction runs map-side (mapInPandas, no shuffle); keep payloads
out of groupBy keys and join the (id -> features) result back instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, byte_min long, byte_max long"
)


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic 32-byte binary payload + typed metadata from
    each document (fixture stand-in for a real image/audio/video blob
    column; in production this column comes from the lakehouse as-is).
    """
    payload = F.unhex(F.concat(F.md5(F.col(text_col)), F.md5(F.reverse(F.col(text_col)))))
    kind = (
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return (
        df.withColumn("payload", payload)
        .withColumn("media_kind", kind)
        .withColumn("media_width", ((F.col(id_col) % 16) * 64 + 64).cast("bigint"))
        .withColumn("media_height", ((F.col(id_col) % 9) * 64 + 64).cast("bigint"))
    )


def decode_image(payload: bytes):
    """Real decode integration point — import-gated, stubbed here."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not available in this "
            "environment; the Spark-side plumbing is exercised with the "
            "deterministic fake decoder byte_stats_features()"
        ) from exc
    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes):
    """Real decode integration point — import-gated, stubbed here."""
    # only the IMPORT is gated: an ImportError raised inside a present
    # soundfile (e.g. a lazy codec plugin) must surface as itself, not be
    # mislabeled "library not available"
    try:
        import io
        import soundfile
    except ImportError as exc:
        raise NotImplementedError(
            "audio decoding requires soundfile, which is not available in "
            "this environment; use byte_stats_features() for the plumbing"
        ) from exc
    return soundfile.read(io.BytesIO(payload))


FRAME_SCHEMA = "doc_id long, frame_idx long, frame binary"


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_len: int = 8,
    stride: int = 8,
) -> DataFrame:
    """Frame sampling: fixed-length byte slices at ``stride`` offsets from
    each payload — the 1->N row-expansion shape a real video frame-sampler
    uses (one input row yields many frame rows), via mapInPandas with
    Arrow batches. Map-side only: frames are emitted in the same task that
    read the payload, nothing shuffles. A real decoder replaces the slice
    with codec output; the plan is unchanged.
    """
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL blobs are routine lakehouse data; emit no
                    # frames rather than kill the stage on bytes(None)
                    continue
                b = bytes(payload)
                for j, off in enumerate(
                    range(0, max(len(b) - frame_len + 1, 0), stride)
                ):
                    ids.append(did)
                    idxs.append(j)
                    frames.append(b[off:off + frame_len])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return narrow.mapInPandas(sample, FRAME_SCHEMA)


def resize_payload(
    df: DataFrame,
    target_bytes: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: downsample each payload to ``target_bytes`` by
    stride sampling (the 1-D analog of nearest-neighbor image resize) via
    mapInPandas — one output row per input, map-side, binary in / binary
    out. A real resize swaps the stride slice for the codec call; schema,
    batching, and plan are identical.
    """
    if target_bytes <= 0:
        # would otherwise surface as a ZeroDivisionError (or garbage
        # slices) deep inside a pandas worker at runtime
        raise ValueError(f"target_bytes must be > 0, got {target_bytes}")
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if payload is None:
                    out.append(None)
                    continue
                b = bytes(payload)
                if len(b) <= target_bytes:
                    out.append(b)
                else:
                    stride = len(b) // target_bytes
                    out.append(bytes(b[i * stride] for i in range(target_bytes)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "resized": out})

    return narrow.mapInPandas(resize, "doc_id long, resized binary")


def byte_stats_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic fake 'decoder': per-payload byte statistics via
    mapInPandas (Arrow batches of binary values -> pandas -> typed rows).

    This is the exact batch shape a real decode/resize/frame-sample UDF
    uses — an iterator of pandas DataFrames, one output row per input row,
    no shuffle, vectorized Arrow transfer.
    """
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads yield null features (len(None) would kill the
            # stage); pandas .map skips None only with na_action
            payloads = pdf["payload"]
            rows = {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len, na_action="ignore"),
                "byte_mean": payloads.map(
                    lambda b: round(sum(b) / len(b), 6) if len(b) else None,
                    na_action="ignore",
                ),
                "byte_min": payloads.map(
                    lambda b: min(b) if len(b) else None, na_action="ignore"
                ),
                "byte_max": payloads.map(
                    lambda b: max(b) if len(b) else None, na_action="ignore"
                ),
            }
            yield pd.DataFrame(rows)

    return narrow.mapInPandas(extract, FEATURE_SCHEMA)
