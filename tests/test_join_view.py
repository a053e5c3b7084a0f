"""Incrementally maintained JOIN view (operators/join_view.py).

The law under test: maintaining the view over ANY batching of the two
sides' commit histories equals one-shot joining their final states —
the join-side analog of the rollup's batching-independence law. Plus:
deletes drop rows (inner) / null out the B side (left), 1:N fan-out,
join-key moves rewrite both old and new key, idempotent re-apply, and
a zero-churn cycle commits nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.join_view import JoinView

A_SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("a_name", StringType(), True),
        StructField("a_score", IntegerType(), True),
    ]
)
B_SCHEMA = StructType(
    [
        StructField("b_id", StringType(), False),
        StructField("k", StringType(), True),
        StructField("b_val", IntegerType(), True),
    ]
)


def _mk_side(spark, root, schema, pk, rows):
    t = LakeTable.create(
        spark, root, schema, primary_key=pk, num_buckets=4,
        cursor_col=None, ts_col=pk,
    )
    _set_side(spark, t, schema, rows)
    return t


def _set_side(spark, t, schema, rows):
    """Overwrite the side table's full state (read_changes diffs states,
    so HOW the side evolved doesn't matter to the view)."""
    df = spark.createDataFrame(rows, schema)
    t.write_and_commit(
        df, replace_buckets=range(4), summary={"operation": "overwrite"}
    )


def _mk_view(spark, root, how="inner"):
    return JoinView.create(
        spark,
        root,
        on="k",
        a_fields=[StructField("a_name", StringType(), True),
                  StructField("a_score", IntegerType(), True)],
        b_fields=[StructField("b_id", StringType(), True),
                  StructField("b_val", IntegerType(), True)],
        key_field=StructField("k", StringType(), True),
        how=how,
        num_buckets=4,
    )


def _oneshot(spark, a, b, how="inner"):
    aa = a.scan().select("k", "a_name", "a_score")
    bb = b.scan().select("k", "b_id", "b_val")
    return aa.join(bb, on="k", how=how)


def _rows(df):
    return sorted(
        tuple(r[c] for c in ["k", "a_name", "a_score", "b_id", "b_val"])
        for r in df.collect()
    )


def test_incremental_equals_oneshot_across_batches(spark, workdir):
    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "p1", 10), ("k2", "p2", 20), ("k3", "p3", 30),
    ])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        ("c1", "k1", 1), ("c2", "k1", 2), ("c3", "k2", 3),
    ])
    v = _mk_view(spark, os.path.join(workdir, "v"))

    # cycle 1: bootstrap (full initial states diff in as inserts)
    assert v.maintain(a, b) is not None
    assert _rows(v.read()) == _rows(_oneshot(spark, a, b))

    # cycle 2: churn on both sides — A updates k1, deletes k2; B adds a
    # child under k3 and re-parents c2 from k1 to k3 (join-key move)
    _set_side(spark, a, A_SCHEMA, [
        ("k1", "p1b", 11), ("k3", "p3", 30),
    ])
    _set_side(spark, b, B_SCHEMA, [
        ("c1", "k1", 1), ("c2", "k3", 2), ("c4", "k3", 4),
    ])
    assert v.maintain(a, b) is not None
    assert _rows(v.read()) == _rows(_oneshot(spark, a, b))

    # cycle 3: only B changes
    _set_side(spark, b, B_SCHEMA, [
        ("c1", "k1", 99), ("c2", "k3", 2), ("c4", "k3", 4),
    ])
    assert v.maintain(a, b) is not None
    assert _rows(v.read()) == _rows(_oneshot(spark, a, b))

    # 1:N fan-out present in the final state
    assert len(_rows(v.read())) == 3

    # zero churn -> no new commit
    before = v.table.current_version()
    assert v.maintain(a, b) is None
    assert v.table.current_version() == before


def test_left_join_nulls_b_side_on_delete(spark, workdir):
    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "p1", 10), ("k2", "p2", 20),
    ])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        ("c1", "k1", 1),
    ])
    v = _mk_view(spark, os.path.join(workdir, "v"), how="left")
    v.maintain(a, b)
    assert _rows(v.read()) == _rows(_oneshot(spark, a, b, how="left"))
    # B loses its only child of k1 -> the k1 row survives with NULL b side
    _set_side(spark, b, B_SCHEMA, [])
    v.maintain(a, b)
    got = _rows(v.read())
    assert got == _rows(_oneshot(spark, a, b, how="left"))
    assert ("k1", "p1", 10, None, None) in got


def test_idempotent_reapply_and_watermark(spark, workdir):
    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "p1", 10),
    ])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        ("c1", "k1", 1),
    ])
    v = _mk_view(spark, os.path.join(workdir, "v"))
    v.maintain(a, b)
    wm = v.watermark()
    assert wm == (a.current_version(), b.current_version())
    # re-apply the same range explicitly: batch id dedupes, no new commit
    before = v.table.current_version()
    keys = spark.createDataFrame([("k1",)], "k string")
    bid = f"join-view-0-{wm[0]}-0-{wm[1]}"  # bootstrap cycle's id
    assert v.apply(a.scan(), b.scan(), keys, batch_id=bid) is None
    assert v.table.current_version() == before


def test_untouched_buckets_not_rewritten(spark, workdir):
    """The commit's replace set must cover only buckets holding touched
    keys — the f(churn) write-path contract."""
    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        (f"k{i}", f"p{i}", i) for i in range(40)
    ])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        (f"c{i}", f"k{i}", i) for i in range(40)
    ])
    v = _mk_view(spark, os.path.join(workdir, "v"))
    v.maintain(a, b)
    # touch ONE key
    _set_side(spark, a, A_SCHEMA, [
        (f"k{i}", f"p{i}" + ("x" if i == 7 else ""), i) for i in range(40)
    ])
    v.maintain(a, b)
    snap = v.table.snapshot()
    k7_bucket = v.table.spark.createDataFrame([("k7",)], "k string").select(
        v.table.bucket_expr("k").alias("b")
    ).collect()[0]["b"]
    # files ADDED by the last commit (path-diff vs the previous snapshot)
    # must all sit in k7's bucket — untouched buckets keep their files
    prev = v.table.snapshot(snap.version - 1)
    prev_paths = {f.path for f in prev.files}
    added = [f for f in snap.files if f.path not in prev_paths]
    assert added and {f.bucket for f in added} == {k7_bucket}
    kept = [f for f in snap.files if f.path in prev_paths]
    assert kept, "untouched buckets' files must survive the commit"
    assert _rows(v.read()) == _rows(_oneshot(spark, a, b))


def test_watermark_advances_on_zero_churn_versions(spark, workdir):
    """Side versions that advance without touching any key (metadata-only
    commits) still move the watermark — a metadata-only view commit — so
    later cycles never re-diff an ever-growing range."""
    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "p1", 10)])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        ("c1", "k1", 1)])
    v = _mk_view(spark, os.path.join(workdir, "v"))
    v.maintain(a, b)
    wm1 = v.watermark()
    # metadata-only commit on side A: version advances, no key changes
    a.commit_metadata_only(summary={"operation": "tag"})
    v.maintain(a, b)
    wm2 = v.watermark()
    assert wm2 == (a.current_version(), b.current_version()) and wm2 != wm1
    # rows unchanged
    assert _rows(v.read()) == _rows(_oneshot(spark, a, b))


def test_ambiguous_side_column_raises_and_select_hook_resolves(spark, workdir):
    """A view column present in both side states must raise (membership
    cannot decide ownership); the maintain-time projection hook resolves
    it."""
    import pytest as _pytest
    from pyspark.sql.types import StructType as _ST

    # B side ALSO carries an 'a_name' column
    b_schema = StructType(list(B_SCHEMA.fields) + [
        StructField("a_name", StringType(), True)])
    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "p1", 10)])
    b = _mk_side(spark, os.path.join(workdir, "b"), b_schema, "b_id", [
        ("c1", "k1", 1, "shadow")])
    v = _mk_view(spark, os.path.join(workdir, "v"))
    with _pytest.raises(ValueError, match="BOTH side states"):
        v.maintain(a, b)
    got = v.maintain(a, b, b_select=lambda df: df.drop("a_name"))
    assert got is not None
    assert _rows(v.read()) == [("k1", "p1", 10, "c1", 1)]


def test_bootstrap_full_recompute_not_v1_diff(spark, workdir):
    """Bootstrap must recompute every key from the CURRENT states, not
    diff against snapshot v1 (which retention may have expired)."""
    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "p1", 10), ("k2", "p2", 20)])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        ("c1", "k1", 1), ("c2", "k2", 2)])
    # advance histories, then expire everything before the current version
    _set_side(spark, a, A_SCHEMA, [("k1", "p1", 10), ("k2", "p2x", 21)])
    if hasattr(a, "expire_snapshots"):
        a.expire_snapshots(keep_last=1)
    v = _mk_view(spark, os.path.join(workdir, "v"))
    assert v.maintain(a, b) is not None
    assert _rows(v.read()) == _rows(_oneshot(spark, a, b))


def test_join_view_feeds_incremental_rollup(spark, workdir):
    """The two halves of incremental view maintenance COMPOSE: the join
    view is itself a LakeTable, so the changelog-driven rollup maintains
    an aggregate over it incrementally — two CDC sides -> incremental
    join -> incremental SUM, every stage f(churn), end result equal to
    the direct GROUP BY over the one-shot join. This is the 1:1 case
    (default row identity = the bucket key); the 1:N case composes via
    row_id_cols, test below."""
    from pyspark.sql.types import StructField as _SF, StringType as _Str

    from airbyte_spark.operators.rollup import (
        create_rollup_table,
        last_maintained_version,
        maintain_rollup,
    )

    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "g1", 10), ("k2", "g2", 20), ("k3", "g1", 30),
    ])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        ("c1", "k1", 1), ("c3", "k2", 3),
    ])
    v = _mk_view(spark, os.path.join(workdir, "v"))
    v.maintain(a, b)

    roll = create_rollup_table(
        spark, os.path.join(workdir, "roll"),
        [_SF("a_name", _Str(), True)], {"sum_b": "b_val"},
    )
    maintain_rollup(roll, v.table, from_version=1,
                    group_cols=["a_name"], metrics={"sum_b": "b_val"})

    def expected():
        return sorted(
            (r["a_name"], r["n_rows"], r["sum_b"])
            for r in _oneshot(spark, a, b)
            .groupBy("a_name")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("b_val").cast("long").alias("sum_b"))
            .collect()
        )

    def got():
        return sorted(
            (r["a_name"], r["n_rows"], r["sum_b"])
            for r in roll.scan().select("a_name", "n_rows", "sum_b").collect()
        )

    assert got() == expected()

    # churn both sides; advance view then rollup from their watermarks
    _set_side(spark, a, A_SCHEMA, [
        ("k1", "g1", 10), ("k2", "g1", 21), ("k3", "g1", 30),
    ])
    _set_side(spark, b, B_SCHEMA, [
        ("c1", "k1", 5), ("c3", "k2", 3), ("c4", "k3", 7),
    ])
    v.maintain(a, b)
    maintain_rollup(roll, v.table,
                    from_version=last_maintained_version(roll),
                    group_cols=["a_name"], metrics={"sum_b": "b_val"})
    assert got() == expected()


def test_join_view_1n_feeds_incremental_rollup(spark, workdir):
    """The 1:N composition (r4's documented gap, now lifted): the view
    fans out several B rows per key, and the downstream rollup maintains
    over its changelog by naming the view's ROW IDENTITY (b_id) via
    row_id_cols — no PK-unique restriction, every stage still f(churn)."""
    from pyspark.sql.types import StructField as _SF, StringType as _Str

    from airbyte_spark.operators.rollup import (
        create_rollup_table,
        last_maintained_version,
        maintain_rollup,
    )

    a = _mk_side(spark, os.path.join(workdir, "a"), A_SCHEMA, "k", [
        ("k1", "g1", 10), ("k2", "g2", 20),
    ])
    b = _mk_side(spark, os.path.join(workdir, "b"), B_SCHEMA, "b_id", [
        ("c1", "k1", 1), ("c2", "k1", 2), ("c3", "k2", 3),  # k1 fans out
    ])
    v = _mk_view(spark, os.path.join(workdir, "v"))
    v.maintain(a, b)

    roll = create_rollup_table(
        spark, os.path.join(workdir, "roll"),
        [_SF("a_name", _Str(), True)], {"sum_b": "b_val"},
    )
    kw = dict(group_cols=["a_name"], metrics={"sum_b": "b_val"},
              row_id_cols="b_id")
    maintain_rollup(roll, v.table, from_version=1, **kw)

    def expected():
        return sorted(
            (r["a_name"], r["n_rows"], r["sum_b"])
            for r in _oneshot(spark, a, b)
            .groupBy("a_name")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("b_val").cast("long").alias("sum_b"))
            .collect()
        )

    def got():
        return sorted(
            (r["a_name"], r["n_rows"], r["sum_b"])
            for r in roll.scan().select("a_name", "n_rows", "sum_b").collect()
        )

    assert got() == expected()
    assert _oneshot(spark, a, b).count() == 3  # genuinely 1:N

    # churn: child value update, child delete, child insert, child MOVES
    # key (c2: k1 -> k2) — the move must subtract from g1 and add to g2
    _set_side(spark, b, B_SCHEMA, [
        ("c1", "k1", 5), ("c2", "k2", 2), ("c4", "k2", 7),
    ])
    v.maintain(a, b)
    maintain_rollup(roll, v.table,
                    from_version=last_maintained_version(roll), **kw)
    assert got() == expected()

    # second churn wave on the A side too (group rename fans to children)
    _set_side(spark, a, A_SCHEMA, [
        ("k1", "g9", 10), ("k2", "g2", 20),
    ])
    v.maintain(a, b)
    maintain_rollup(roll, v.table,
                    from_version=last_maintained_version(roll), **kw)
    assert got() == expected()
