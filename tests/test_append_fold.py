"""Token-append update folds (operators/append_fold.py).

The law under test: applying per-batch summaries across ANY
order-contiguous batching equals the one-shot fold — hypothesis-fuzzed
over random op sequences and split points against a single-threaded
Python reference. Plus: orphan counting, delete epochs, restart-after-
delete, and empty/null delta handling.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from airbyte_spark.operators.append_fold import (
    apply_token_appends,
    fold_token_appends,
)

SCHEMA = "doc_id string, lsn long, ts_ms long, op string, tokens array<int>"


def _df(spark, events):
    rows = [(k, i, 1000 + i, op, toks) for i, (k, op, toks) in enumerate(events)]
    return spark.createDataFrame(rows, SCHEMA)


def _reference(events):
    """Single-threaded truth: final tokens per key (absent = no row)."""
    state: dict = {}
    for k, op, toks in events:
        if op == "I":
            state[k] = list(toks or [])
        elif op == "D":
            state[k] = None
        elif op == "U" and state.get(k) is not None:
            state[k] = state[k] + list(toks or [])
    return {k: v for k, v in state.items() if v is not None}


def _final_rows(df):
    return {
        r["doc_id"]: list(r["tokens"])
        for r in df.collect()
        if r["tokens"] is not None
    }


def _run_batched(spark, events, splits):
    """Fold each batch, thread summaries through apply_token_appends."""
    empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
    stored = empty
    bounds = [0, *sorted(splits), len(events)]
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        batch = _df(spark, events[lo:hi])
        # preserve global order: lsn is the global index (see _df) — give
        # each batch its slice of events with their original lsns
        batch = batch.withColumn("lsn", F.col("lsn") + lo)
        summary = fold_token_appends(batch)
        stored = apply_token_appends(stored, summary).filter(
            ~F.col("_orphaned")
        ).select("doc_id", "tokens")
    return stored


def test_basic_epochs_and_orphans(spark):
    events = [
        ("a", "U", [9]),          # orphan: no epoch yet
        ("a", "I", [1, 2]),
        ("a", "U", [3]),
        ("a", "U", [4, 5]),
        ("b", "I", [7]),
        ("b", "D", None),
        ("b", "U", [8]),          # orphan: appended after delete
        ("c", "I", [0]),
        ("c", "D", None),
        ("c", "I", [6]),          # restart after delete
        ("c", "U", [6]),
    ]
    s = fold_token_appends(_df(spark, events))
    got = {r["doc_id"]: r for r in (x.asDict() for x in s.collect())}
    assert got["a"]["state"] == [1, 2, 3, 4, 5] and got["a"]["alive"]
    assert got["a"]["n_orphans"] == 0  # pre-epoch U lands in prefix_deltas
    assert got["a"]["prefix_deltas"] == [9]
    assert not got["b"]["alive"] and got["b"]["n_orphans"] == 1
    assert got["c"]["state"] == [6, 6] and got["c"]["alive"]

    final = _final_rows(
        apply_token_appends(
            spark.createDataFrame([], "doc_id string, tokens array<int>"), s
        )
    )
    assert final == _reference(events)


def test_prefix_appends_to_stored_state(spark):
    stored = spark.createDataFrame(
        [("a", [1, 2]), ("z", [0])], "doc_id string, tokens array<int>"
    )
    events = [("a", "U", [3]), ("a", "U", [4]), ("q", "U", [5])]
    s = fold_token_appends(_df(spark, events))
    out = apply_token_appends(stored, s)
    rows = {r["doc_id"]: r for r in (x.asDict() for x in out.collect())}
    assert rows["a"]["tokens"] == [1, 2, 3, 4] and rows["a"]["n_tok"] == 4
    assert rows["z"]["tokens"] == [0]  # untouched passthrough
    assert rows["q"]["_orphaned"] and rows["q"]["tokens"] is None


def test_prefix_delete_kills_stored(spark):
    stored = spark.createDataFrame(
        [("a", [1])], "doc_id string, tokens array<int>"
    )
    events = [("a", "U", [2]), ("a", "D", None)]
    out = apply_token_appends(stored, fold_token_appends(_df(spark, events)))
    assert out.count() == 0


@settings(max_examples=8, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from(["I", "U", "U", "D"]),
            st.lists(st.integers(0, 9), max_size=3),
        ),
        min_size=1,
        max_size=24,
    ),
    data=st.data(),
)
def test_batching_law(spark, ops, data):
    events = [(k, op, None if op == "D" else toks) for k, op, toks in ops]
    n_splits = data.draw(st.integers(0, 3))
    splits = data.draw(
        st.lists(
            st.integers(0, len(events)),
            min_size=n_splits,
            max_size=n_splits,
        )
    )
    got = _final_rows(_run_batched(spark, events, splits))
    assert got == _reference(events)


def test_fold_follows_widened_token_type(spark):
    """A changelog whose tokens column was widened to array<bigint> must
    fold without the ARRAY<INT> accumulator mismatch (the widening +
    token_append combination)."""
    rows = [("a", 1, 0, "I", [3_000_000_000]), ("a", 2, 0, "U", [1])]
    df = spark.createDataFrame(
        rows, "doc_id string, lsn long, ts_ms long, op string, tokens array<bigint>"
    )
    s = fold_token_appends(df)
    got = s.collect()[0]
    assert got["state"] == [3_000_000_000, 1] and got["alive"]
