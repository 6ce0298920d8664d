"""Multimodal (binary-payload) columns — image/audio/video/raster.

Generalizes the reference's raster stage (``lambdas/cogify/handler.py``:
download -> decode -> transform -> encode -> upload) into the engine's
sanctioned heavy-UDF pattern:

- payloads are opaque ``BinaryType`` columns (or references: an
  ``s3_filename`` to fetch executor-side, exactly like the reference's
  ``download_file`` at cogify/handler.py:49-71);
- metadata (dims, dtype, nodata, bbox) lives in ordinary columns so
  filters/joins never touch bytes;
- decode / feature-extract / resize / frame-sample run inside
  ``mapInPandas`` — Arrow-batched, one Python worker per core, the only
  sanctioned Python in the engine;
- batch size for raster work is kept small (the reference allots 8 GB
  per worker — lambda_stack.py:75) via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Decoders for real image/audio libs are NOT available in this container:
the decode step is stubbed behind ``NotImplementedError`` with a
deterministic fake (byte-histogram features), keeping the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape —
real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "asset_id string, modality string, n_bytes bigint, sha256 string, "
    "features array<double>"
)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: normalized 16-bin byte
    histogram.  Replace with PIL/librosa/ffmpeg decode in a container
    that ships them."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def real_decode(payload: bytes, modality: str):  # pragma: no cover - stub
    """The real decoder hook. Container lacks image/audio libs: STUB."""
    raise NotImplementedError(
        "image/audio decode requires PIL/librosa/ffmpeg, not present in "
        "this container; wire them here and swap _fake_decode_features"
    )


def extract_features(
    assets: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    modality_col: str = "modality",
) -> DataFrame:
    """Binary payloads -> per-asset feature rows via Arrow-batched
    ``mapInPandas`` (schema-stable, tested plumbing; fake decoder)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "modality": pdf[modality_col],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "features": [_fake_decode_features(p) for p in payloads],
                }
            )

    cols = [id_col, modality_col, payload_col]
    return assets.select(*cols).mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(
    assets: DataFrame,
    every_n: int = 10,
    id_col: str = "asset_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Video frame sampling as a pure-column explode: one output row per
    sampled frame index (the decode of each frame then rides the
    mapInPandas path above).  Partition explosion is intentional and
    bounded by every_n."""
    idx = F.explode(
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
    ).alias("frame_index")
    return assets.select(F.col(id_col), idx)


def payload_meta(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Cheap byte-level metadata WITHOUT leaving the JVM: length + md5.
    Use before routing to the Python decode stage so trivially-skippable
    assets (empty, oversized, known-hash) never cross the Arrow bridge."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )
