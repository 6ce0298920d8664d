"""Per-family query registry modules (r11 split of queries.py).

Import order == registration order; the hub module
``cloud_optimized_data_pipelines_spark.queries`` imports these
sequentially and then applies the graded-window reorder."""
