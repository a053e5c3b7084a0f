"""Vocabulary-migration token remap — Arrow-native vectorized.

When the upstream tokenizer changes (vocab v1 -> v2: merges re-trained,
ids re-assigned, vocab grown), every STORED token id must be rewritten
before v2 events can replay into the same table. The remap itself is a
pure per-row projection, and the id domain is vocabulary-sized (bounded,
~10^4-10^5), so the scalable shape is a broadcast LOOKUP TABLE applied
inside the scan-project stage — never a posexplode -> join -> regroup
(that re-shuffles every token in the corpus to move an id through a
join), and never a codegen'd 50k-entry literal map (expression-tree
blowup). An ``arrow_udf`` with a closed-over numpy table is the
engine-sanctioned vectorized path (same contract as
``functions/validate.py``): one ``np.take`` over the flat values buffer,
output reuses the input offsets + validity, zero per-row Python.

Ids outside the mapping's domain (or mapped to a negative sentinel)
rewrite to ``unk_id`` and the row is flagged — same repair+flag policy as
validation (never drop, never fail).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql.functions import arrow_udf

_RESULT_32 = "struct<tokens: array<int>, n_remapped: int, n_unk: int>"
_RESULT_64 = "struct<tokens: array<bigint>, n_remapped: int, n_unk: int>"
_I32_MAX = (1 << 31) - 1

#: sentinel for "old id has no v2 equivalent" inside the dense table
NO_MAPPING = -1


def mapping_table(pairs, size: int | None = None) -> np.ndarray:
    """(old_id, new_id) pairs -> dense lookup array ``t[old] = new``.

    Unmapped slots hold ``NO_MAPPING`` (-> unk at apply time). ``size``
    defaults to max(old_id)+1. Vocabulary-sized: this array is broadcast
    to executors via UDF closure — a few hundred KB for a 100k vocab.
    """
    pairs = list(pairs)
    if size is None:
        size = max(o for o, _ in pairs) + 1 if pairs else 0
    t = np.full(size, NO_MAPPING, dtype=np.int64)
    for old, new in pairs:
        if not 0 <= old < size:
            raise ValueError(f"old id {old} outside table size {size}")
        t[old] = new
    return t


def make_token_remapper(table: np.ndarray, unk_id: int):
    """Return an arrow UDF: tokens -> struct(tokens, n_remapped, n_unk).

    ``n_remapped`` counts ids that changed value; ``n_unk`` counts ids
    that had no mapping (rewritten to ``unk_id``). NULL token arrays
    (tombstone images) pass through untouched.
    """
    lut = np.ascontiguousarray(table, dtype=np.int64)
    size = lut.shape[0]
    # output element width follows the TARGET id domain: a v2 vocabulary
    # past 2^31 (or an unk sentinel past it) must come back as
    # array<bigint>, never silently wrap in int32 (the array-element
    # widening exists for exactly this case)
    wide = bool(size and lut.max() > _I32_MAX) or unk_id > _I32_MAX
    out_np = np.int64 if wide else np.int32
    out_pa = pa.int64() if wide else pa.int32()

    @arrow_udf(_RESULT_64 if wide else _RESULT_32)
    def remap(tokens: pa.Array) -> pa.Array:
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        n = len(tokens)
        null_mask = tokens.is_null().to_numpy(zero_copy_only=False)
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off0 = offsets[0]
        flat = np.asarray(tokens.values)[off0:offsets[-1]].astype(np.int64)

        in_range = (flat >= 0) & (flat < size)
        if size:
            mapped = np.where(
                in_range, lut[np.clip(flat, 0, size - 1)], NO_MAPPING
            )
        else:  # empty mapping: everything is unmapped -> unk, never IndexError
            mapped = np.full(flat.shape, NO_MAPPING, dtype=np.int64)
        unk = mapped == NO_MAPPING
        out_flat = np.where(unk, np.int64(unk_id), mapped).astype(out_np)

        changed = (out_flat != flat) & ~unk
        # per-row counts via reduceat over the flat buffer
        starts = offsets[:-1] - off0
        lens = np.diff(offsets)
        def _rowcount(mask):
            if mask.size == 0:
                return np.zeros(n, dtype=np.int32)
            csum = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
            return (csum[offsets[1:] - off0] - csum[starts]).astype(np.int32)
        n_remapped = _rowcount(changed)
        n_unk = _rowcount(unk)

        out_tokens = pa.ListArray.from_arrays(
            pa.array(offsets - off0, type=pa.int32()),
            pa.array(out_flat, type=out_pa),
            mask=pa.array(null_mask),
        )
        return pa.StructArray.from_arrays(
            [
                out_tokens,
                pa.array(np.where(null_mask, 0, n_remapped), type=pa.int32()),
                pa.array(np.where(null_mask, 0, n_unk), type=pa.int32()),
            ],
            names=["tokens", "n_remapped", "n_unk"],
        )

    return remap


def remap_column(tokens_col: Column, table: np.ndarray, unk_id: int) -> Column:
    """Column-level convenience: tokens -> remapped struct."""
    return make_token_remapper(table, unk_id)(tokens_col)
