"""Relational operators of the CDC engine, expressed Spark-first."""

from airbyte_spark.operators.dedup import lww_dedup
from airbyte_spark.operators.metadata import inject_cdc_metadata
from airbyte_spark.operators.merge import merge_upsert

__all__ = ["lww_dedup", "inject_cdc_metadata", "merge_upsert"]
