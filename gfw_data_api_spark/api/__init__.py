"""Thin HTTP layer reproducing the reference's endpoint contracts."""

from gfw_data_api_spark.api.app import create_app

__all__ = ["create_app"]
