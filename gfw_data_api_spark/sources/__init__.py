"""Ingestion pipelines and table loading."""

from gfw_data_api_spark.sources.tabular import load_table

__all__ = ["load_table"]
