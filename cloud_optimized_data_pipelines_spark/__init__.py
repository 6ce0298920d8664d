"""cloud_optimized_data_pipelines_spark — a PySpark-native analytics engine
with the query and data-processing capabilities of
NASA-IMPACT/cloud-optimized-data-pipelines (veda-data-pipelines).

The reference (/root/reference) is a serverless JSON-event ETL pipeline:
discover (S3/CMR) -> cogify -> transfer -> build-STAC -> submit.  This
package re-expresses every operator as declarative Spark DataFrame plans
(SURVEY.md section 2 is the inventory), plus the large-scale
training-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for the 100 TB / 1000-executor regime.

Design stance (SURVEY.md section 7):
- DataFrame/SQL everywhere; Catalyst is the optimizer; no RDDs.
- Scalar semantics (date extraction, item ids, URL math) are pure
  ``pyspark.sql.functions`` column expressions -> whole-stage codegen.
- Raster / binary-payload work is quarantined behind Arrow-batched
  pandas UDFs (``mapInPandas``) so everything else stays JVM-side.
- Small dimension/config tables are broadcast; existence checks are
  left-anti joins; queue hops are either operator pipelining (batch) or
  Structured Streaming micro-batches (streaming mode).
"""

__version__ = "0.1.0"
