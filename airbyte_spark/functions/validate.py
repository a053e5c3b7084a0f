"""Token payload validation / normalization — Arrow-vectorized.

The reference captures per-column typing errors into _airbyte_meta.errors
instead of failing the row (BigQuerySqlGenerator.java:544-566 safe-cast CTE;
airbyte-protocol.md:439-450 'destinations never fail on mismatch'). Same
policy here: repair + flag, never drop.

Rules (mirrored 1:1 by changelog.golden._validate_payload):
- tokens element out of [0, vocab)    -> token %= vocab, flag "oov_tokens"
- n_tok != len(tokens)                -> n_tok := len(tokens), flag "n_tok_mismatch"
- tokens NULL (delete image)          -> passthrough, no flags

Implementation notes: operates on the Arrow batch as flat numpy
(np.concatenate + offset math + reduceat), so cost is O(total tokens) in C,
not O(rows) in Python. At 100 TB this runs inside the scan-project stage,
Arrow both ways, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_RESULT_TYPE = "struct<tokens: array<int>, n_tok: int, errors: array<string>>"


def make_token_validator(vocab_size: int):
    """Return a pandas UDF: (tokens, n_tok) -> struct(tokens, n_tok, errors)."""

    @pandas_udf(_RESULT_TYPE)
    def validate(tokens: pd.Series, n_tok: pd.Series) -> pd.DataFrame:
        n = len(tokens)
        null_mask = tokens.isna().to_numpy()
        arrays = [
            np.asarray(a, dtype=np.int64) if not isnull else np.empty(0, dtype=np.int64)
            for a, isnull in zip(tokens, null_mask)
        ]
        lens = np.fromiter((a.size for a in arrays), dtype=np.int64, count=n)
        flat = np.concatenate(arrays) if n and lens.sum() else np.empty(0, dtype=np.int64)

        oov_flat = (flat < 0) | (flat >= vocab_size)
        # per-row "any oov" via reduceat over the offsets of non-empty rows
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        has_oov = np.zeros(n, dtype=bool)
        nonempty = lens > 0
        if oov_flat.any():
            seg_any = np.logical_or.reduceat(oov_flat, offsets[:-1][nonempty])
            has_oov[nonempty] = seg_any
        if has_oov.any():
            flat = np.mod(flat, vocab_size)

        n_tok_np = n_tok.to_numpy(dtype=np.float64, na_value=np.nan)
        mismatch = (~null_mask) & (np.isnan(n_tok_np) | (n_tok_np != lens))

        out_tokens: list = [None] * n
        errors: list = [None] * n
        for k in range(n):
            if null_mask[k]:
                errors[k] = []
                continue
            if has_oov[k]:
                out_tokens[k] = flat[offsets[k] : offsets[k + 1]].astype(np.int32)
            else:
                out_tokens[k] = arrays[k].astype(np.int32)
            errs = []
            if has_oov[k]:
                errs.append("oov_tokens")
            if mismatch[k]:
                errs.append("n_tok_mismatch")
            errors[k] = errs
        out_n_tok = np.where(null_mask, n_tok_np, lens)
        out_n_tok_s = pd.array(out_n_tok, dtype="Int64")
        return pd.DataFrame(
            {"tokens": out_tokens, "n_tok": out_n_tok_s.astype("Int32"), "errors": errors}
        )

    return validate


def apply_validation(df, vocab_size: int, tokens_col: str = "tokens", n_tok_col: str = "n_tok"):
    """Replace tokens/n_tok with repaired values; attach _ab_meta.errors."""
    validate = make_token_validator(vocab_size)
    v = validate(F.col(tokens_col), F.col(n_tok_col))
    original_n_tok_type = dict(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )[n_tok_col]
    return (
        df.withColumn("_v", v)
        .withColumn(tokens_col, F.col("_v.tokens"))
        .withColumn(n_tok_col, F.col("_v.n_tok").cast(original_n_tok_type))
        .withColumn("_ab_meta", F.struct(F.col("_v.errors").alias("errors")))
        .drop("_v")
    )
