"""Incremental rollup maintenance (operators/rollup.py) + full changelog
vocabulary (read_changes update_images).

Law gated here: maintaining a rollup over ANY batching of the source's
commit history == the direct GROUP BY over the final live table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.rollup import (
    GROUP_KEY,
    create_rollup_table,
    last_maintained_version,
    maintain_rollup,
)

SRC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("n_tok", IntegerType(), True),
        StructField("_ab_cdc_deleted_at", LongType(), True),
        StructField("_ab_lsn", LongType(), False),
    ]
)

METRICS = {"sum_tok": "n_tok"}
GROUPS = ["lang"]


def _src(spark, workdir) -> LakeTable:
    return LakeTable.create(
        spark, os.path.join(workdir, "src"), SRC_SCHEMA,
        primary_key="doc_id", num_buckets=4, cursor_col="_ab_lsn",
    )


def _commit_state(spark, t: LakeTable, rows) -> int:
    """Overwrite the table with a full state (simplest way to step through
    live states; read_changes diffs states, not commit mechanics)."""
    df = spark.createDataFrame(rows, SRC_SCHEMA)
    return t.write_and_commit(
        df, replace_buckets=range(4), summary={"operation": "overwrite"}
    )


# live states: v2 = inserts; v3 = update d1 (lang move en->de), delete d2,
# insert d4; v4 = delete d4, update d3's n_tok in place
V2 = [
    ("d1", "en", 10, None, 1),
    ("d2", "en", 20, None, 2),
    ("d3", "de", 30, None, 3),
]
V3 = [
    ("d1", "de", 11, None, 4),
    ("d2", "en", 20, 5, 5),  # tombstone -> live delete
    ("d3", "de", 30, None, 3),
    ("d4", "zh", 40, None, 6),
]
V4 = [
    ("d1", "de", 11, None, 4),
    ("d3", "de", 35, None, 7),
]


@pytest.fixture()
def source(spark, workdir):
    t = _src(spark, workdir)
    for state in (V2, V3, V4):
        _commit_state(spark, t, state)
    return t  # versions: 1 empty, 2, 3, 4


def _group_fields():
    return [StructField("lang", StringType(), True)]


def _direct(spark, t: LakeTable, version: int):
    live = t.scan(version=version).filter(F.col("_ab_cdc_deleted_at").isNull())
    return {
        r.lang: (r.n, r.s)
        for r in live.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"))
        .collect()
    }


def _rollup_state(rollup: LakeTable):
    return {
        r.lang: (r.n_rows, r.sum_tok) for r in rollup.scan().collect()
    }


def test_update_images_vocabulary(spark, source):
    ch = source.read_changes(2, 3, update_images=True)
    by_type = {}
    for r in ch.collect():
        by_type.setdefault(r._change_type, []).append(r)
    assert sorted(by_type) == ["delete", "insert", "update_after", "update_before"]
    # the update emits BOTH images with the right values
    ub = by_type["update_before"][0]
    ua = by_type["update_after"][0]
    assert (ub.doc_id, ub.lang, ub.n_tok) == ("d1", "en", 10)
    assert (ua.doc_id, ua.lang, ua.n_tok) == ("d1", "de", 11)
    assert by_type["delete"][0].doc_id == "d2"
    assert by_type["insert"][0].doc_id == "d4"
    # default mode unchanged: single update row, after-image
    ch1 = {r._change_type for r in source.read_changes(2, 3).collect()}
    assert ch1 == {"insert", "update", "delete"}


def test_stepwise_equals_direct_and_oneshot(spark, workdir, source):
    step = create_rollup_table(
        spark, os.path.join(workdir, "r_step"), _group_fields(), METRICS
    )
    for v in (2, 3, 4):
        maintain_rollup(step, source, v - 1, v, group_cols=GROUPS, metrics=METRICS)
        assert _rollup_state(step) == _direct(spark, source, v), f"diverged at v{v}"

    oneshot = create_rollup_table(
        spark, os.path.join(workdir, "r_one"), _group_fields(), METRICS
    )
    maintain_rollup(oneshot, source, 1, 4, group_cols=GROUPS, metrics=METRICS)
    assert _rollup_state(oneshot) == _rollup_state(step) == _direct(spark, source, 4)
    # groups whose count reached zero are dropped, not left at 0
    assert "zh" not in _rollup_state(step)
    assert "en" not in _rollup_state(step)  # d1 moved to de, d2 deleted


def test_maintenance_idempotent_and_noop(spark, workdir, source):
    r = create_rollup_table(
        spark, os.path.join(workdir, "r"), _group_fields(), METRICS
    )
    maintain_rollup(r, source, 1, 3, group_cols=GROUPS, metrics=METRICS)
    v_after = r.current_version()
    # same diff again: batch-id idempotence, no new snapshot
    assert maintain_rollup(r, source, 1, 3, group_cols=GROUPS, metrics=METRICS) is None
    assert r.current_version() == v_after
    # no-op range
    assert maintain_rollup(r, source, 3, 3, group_cols=GROUPS, metrics=METRICS) is None
    # then advance to current
    maintain_rollup(r, source, 3, group_cols=GROUPS, metrics=METRICS)
    assert _rollup_state(r) == _direct(spark, source, 4)


def test_watermark_resume_with_zero_external_state(spark, workdir, source):
    """A scheduled maintenance job keeps NO state of its own: it reads the
    durable watermark off the rollup's latest rollup-merge summary and
    advances from there."""
    r = create_rollup_table(
        spark, os.path.join(workdir, "r"), _group_fields(), METRICS
    )
    assert last_maintained_version(r) is None  # fresh rollup: bootstrap

    def run_scheduled_job():
        frm = last_maintained_version(r) or 1
        return maintain_rollup(r, source, frm, group_cols=GROUPS, metrics=METRICS)

    assert run_scheduled_job() is not None  # consumes 1 -> 4
    assert last_maintained_version(r) == source.current_version()
    assert _rollup_state(r) == _direct(spark, source, 4)
    # nothing new in the source: the next scheduled run is a pure no-op
    # and the watermark is unchanged
    assert run_scheduled_job() is None
    assert last_maintained_version(r) == source.current_version()
    # new source commit -> the job picks up exactly the new range
    _commit_state(spark, source, V4 + [("d9", "fr", 100, None, 9)])
    assert run_scheduled_job() is not None
    assert last_maintained_version(r) == source.current_version()
    assert _rollup_state(r)["fr"] == (1, 100)


def test_null_group_is_its_own_bucket(spark, workdir):
    t = _src(spark, workdir)
    _commit_state(spark, t, [("d1", None, 5, None, 1), ("d2", None, 7, None, 2),
                             ("d3", "en", 1, None, 3)])
    r = create_rollup_table(
        spark, os.path.join(workdir, "r"), _group_fields(), METRICS
    )
    maintain_rollup(r, t, 1, group_cols=GROUPS, metrics=METRICS)
    state = _rollup_state(r)
    assert state[None] == (2, 12)
    assert state["en"] == (1, 1)
