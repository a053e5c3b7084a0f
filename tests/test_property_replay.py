"""Property-based replay fuzzing (hypothesis) — the engine must match the
single-threaded golden applier for ARBITRARY event streams, duplication
patterns, and batch splits, not just the generator's distributions.

The reference has no property tests (SURVEY.md §5 'none found'); this layer
generalizes its golden suites. Events are fully determined by (doc, lsn) —
at-least-once re-emission is verbatim, as in a real WAL where the LSN
identifies the change — so any duplication the strategy produces is the
legal kind. Ties in (lsn, ts_ms) across *different* docs, deletes winning
and losing, out-of-vocab tokens, n_tok corruption, and 1-event batches all
fall out of the search space.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airbyte_spark.changelog import apply_golden
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.schemas import changelog_schema
from tests.util import assert_frames_equal, final_as_pandas, golden_normalize

BASE_TS = 1_700_000_000_000


def _event(doc_i: int, lsn: int) -> tuple:
    """The unique event at (doc_i, lsn): op, payload, corruption are all
    deterministic functions of the pair, so re-emissions are verbatim."""
    op = "IUD"[(doc_i + lsn) % 3]
    ts_ms = BASE_TS + lsn * 10 + (doc_i * lsn) % 2
    doc_id = f"d{doc_i}"
    if op == "D":
        return (op, doc_id, lsn, ts_ms, doc_i % 3, None, None, None)
    toks = [((doc_i * 7 + lsn * 3 + t) % 130) - 5 for t in range(lsn % 4 + 1)]
    corrupt = (doc_i * 31 + lsn) % 5 == 0
    n_tok = len(toks) + (2 if corrupt else 0)
    return (op, doc_id, lsn, ts_ms, doc_i % 3, toks, n_tok, "web")


pairs = st.lists(
    st.tuples(st.integers(0, 5), st.integers(1, 15)), min_size=1, max_size=40
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pairs=pairs, batch_events=st.integers(1, 12))
def test_replay_matches_golden(spark, tmp_path_factory, pairs, batch_events):
    rows = [_event(d, l) for d, l in pairs]
    df = spark.createDataFrame(rows, changelog_schema())

    root = str(tmp_path_factory.mktemp("prop"))
    eng = CdcEngine(
        spark,
        os.path.join(root, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=batch_events, vocab_size=100),
    )
    eng.create_table()
    eng.replay(df)

    # vocab 100: tokens in [-5, 125) exercise the oov repair on both sides
    exp = golden_normalize(apply_golden(None, df.toPandas(), vocab_size=100))
    got = final_as_pandas(eng.read_final())
    assert_frames_equal(got, exp)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pairs=pairs, batch_events=st.integers(1, 12))
def test_replay_matches_golden_mor_path(spark, tmp_path_factory, pairs, batch_events):
    """Same fuzz, but on a SEEDED table with merge-on-read forced for every
    batch (mor_max_fraction=1.0): arbitrary streams, duplication, and
    batch splits must resolve through delta files to the exact golden
    state. Event doc ids collide with seeded ids so updates/deletes hit
    pre-existing rows through the MoR resolution path."""
    from airbyte_spark.changelog import ChangelogConfig, seed_df

    rows = [_event(d, l) for d, l in pairs]
    # retarget the fuzzed events at the seeded id space
    rows = [(op, f"doc{int(did[1:]):09d}", *rest) for (op, did, *rest) in rows]
    df = spark.createDataFrame(rows, changelog_schema())

    root = str(tmp_path_factory.mktemp("prop_mor"))
    seed = seed_df(spark, ChangelogConfig(n_events=0, n_seed_docs=60, vocab_size=100))
    eng = CdcEngine(
        spark,
        os.path.join(root, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(
            batch_events=batch_events,
            vocab_size=100,
            mor_max_fraction=1.0,
            compact_after_replay_max_files=None,
        ),
    )
    eng.create_table()
    eng.bootstrap(seed)
    eng.replay(df)
    assert eng.table.delta_file_count() > 0  # every batch took the MoR path

    exp = golden_normalize(apply_golden(seed.toPandas(), df.toPandas(), vocab_size=100))
    assert_frames_equal(final_as_pandas(eng.read_final()), exp)
