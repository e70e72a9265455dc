"""gfw_data_api_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of wri/gfw-data-api.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, parquet-backed storage with partition pruning, and pandas UDFs
only where built-in operators genuinely can't express the semantics
(geometry predicates, raster map algebra).

Layout
------
- ``session``    : tuned SparkSession builder (local testing / cluster-ready)
- ``sql``        : the guarded read-only single-table SQL dialect
                   (validation matrix + rewrite, reference parity)
- ``catalog``    : dataset/version/asset registry + warehouse layout
- ``sources``    : ingestion pipelines (tabular CSV/TSV, vector, appends)
- ``functions``  : geometry library (pure NumPy/Python; no GEOS available)
- ``operators``  : query execution, spatial filters, lookups, pagination
- ``raster``     : data-environment model + OTF zonal statistics
- ``streaming``  : incremental append ingestion (Trigger.AvailableNow)
- ``llmops``     : dedup / similarity / text-analysis / multimodal operators
"""

__version__ = "0.1.0"
