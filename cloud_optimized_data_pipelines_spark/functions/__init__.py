"""Column-expression library — the reference's scalar semantics as pure
``pyspark.sql.functions`` compositions (JVM-side, whole-stage codegen;
no Python UDFs anywhere on this surface)."""

from cloud_optimized_data_pipelines_spark.functions.dates import (  # noqa: F401
    extract_dates,
    month_range,
    year_range,
)
from cloud_optimized_data_pipelines_spark.functions.ids import (  # noqa: F401
    item_id,
    path_basename,
    path_stem,
)
from cloud_optimized_data_pipelines_spark.functions.urls import (  # noqa: F401
    s3_url,
    target_key,
    url_bucket,
    url_key,
)
