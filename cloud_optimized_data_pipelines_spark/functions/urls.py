"""URL / key scalars (SURVEY C7, C9).

Replicates the reference's ``urllib.parse.urlparse`` usage
(``lambdas/data-transfer/handler.py:36-42``,
``lambdas/submit-stac/handler.py:101-104``) and f-string key math
(``lambdas/s3-discovery/handler.py:58``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cloud_optimized_data_pipelines_spark.functions.ids import path_basename


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_bucket(url: Column | str) -> Column:
    """Hostname component — ``urlparse(url).hostname`` (bucket for s3://).

    Regexp-based rather than ``parse_url(HOST)``: Spark's parse_url
    (java.net.URI) NULLs out hosts urlparse accepts (e.g. the all-
    numeric reg-name ``0.0`` — caught by the hypothesis fuzz), and
    ``.hostname`` additionally LOWERCASES and strips userinfo/port.
    Still a pure codegen expression.
    """
    return F.lower(
        F.regexp_extract(_c(url), r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )


def url_key(url: Column | str) -> Column:
    """Path component without the leading '/' — ``urlparse(url).path[1:]``."""
    return F.regexp_replace(
        F.regexp_extract(_c(url), r"^[^:/?#]+://[^/?#]*([^?#]*)", 1), r"^/", ""
    )


def s3_url(bucket: Column | str, key: Column | str) -> Column:
    """``f"s3://{bucket}/{key}"`` (s3-discovery/handler.py:58)."""
    return F.concat(F.lit("s3://"), _c(bucket), F.lit("/"), _c(key))


def target_key(collection: Column | str, source_url: Column | str) -> Column:
    """``f"{collection}/{filename}"`` — the transfer target key
    (data-transfer/handler.py:39-42): collection + '/' + source basename."""
    return F.concat_ws("/", _c(collection), path_basename(_c(source_url)))
