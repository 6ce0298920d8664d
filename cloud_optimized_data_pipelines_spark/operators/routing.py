"""Routing operators (SURVEY F8-F11).

The reference's Step Functions Choice states become filtered unions:
the cogify branch (``deploy/cdk/step_function_stack.py:80-99``) splits
the event stream on ``cogify``; event-type dispatch
(``build-stac/handler.py:40-41``) branches on ``granule_id`` presence.

Physically, a split-transform-union over one source is a single scan:
Catalyst collapses the two filters into the same exchange-free stage
when the transforms are column-level, so "routing" costs nothing at
100 TB — no materialized queues, no extra shuffle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_discovery(discovery: str) -> str:
    """F8: Choice on discovery type; unknown -> Fail (step_function_stack.py:111)."""
    if discovery not in ("s3", "cmr"):
        raise ValueError(f"Unsupported discovery type: {discovery!r}")
    return discovery


def split_cogify(
    events: DataFrame,
    cogify_stage: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """F9: cogify? -> raster stage, else passthrough; reunited by name.

    ``cogify_stage`` is the (pandas-UDF) raster transform; identity when
    absent so the metadata-only pipeline stays pure-column.
    """
    flag = F.coalesce(F.col("cogify"), F.lit(False))
    to_cogify = events.filter(flag)
    passthrough = events.filter(~flag)
    if cogify_stage is not None:
        to_cogify = cogify_stage(to_cogify)
    return to_cogify.unionByName(passthrough, allowMissingColumns=True)


def is_cmr_event() -> F.Column:
    """F10: CmrEvent iff granule_id present (build-stac/handler.py:40-41)."""
    return F.col("granule_id").isNotNull()
