"""JSON payload scalars (SURVEY C10-C12).

The reference spills STAC items larger than 256 KiB to S3 because Step
Functions caps state size (``lambdas/build-stac/handler.py:44-55``).
Spark has no such limit — the flag is kept for sink-behavior parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# CPython sys.getsizeof(str) = len + 49 for ASCII strings; the reference
# tests `getsizeof(json.dumps(item)) < 256 * 1024` (handler.py:47).
GETSIZEOF_ASCII_OVERHEAD = 49
SPILL_LIMIT_BYTES = 256 * 1024


def payload_size(json_col: Column) -> Column:
    """Approximate ``sys.getsizeof(json.dumps(...))`` (documented approximation:
    exact for ASCII payloads, which STAC items are)."""
    return F.length(json_col) + F.lit(GETSIZEOF_ASCII_OVERHEAD)


def spill_required(json_col: Column, limit: int = SPILL_LIMIT_BYTES) -> Column:
    """True when the serialized item must be side-filed (handler.py:47)."""
    return payload_size(json_col) >= F.lit(limit)
