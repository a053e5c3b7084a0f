"""Vectorized payload functions (the only Python in the data path).

North rule: no per-row Python. Everything here is an Arrow-batched pandas
UDF (`pandas_udf`) or pure Spark column expressions.
"""

from airbyte_spark.functions.multimodal import (
    extract_asset_features,
    sample_frames,
    synthesize_assets,
)
from airbyte_spark.functions.textnorm import clean_text, unicode_clean
from airbyte_spark.functions.validate import make_token_validator

__all__ = [
    "make_token_validator",
    "clean_text",
    "unicode_clean",
    "extract_asset_features",
    "sample_frames",
    "synthesize_assets",
]
