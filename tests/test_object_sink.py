"""Object-storage destination (object_sink.py): formats + gzip, manifest
exactly-once, overwrite generations, COPY manifest, vacuum."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from airbyte_spark.object_sink import ObjectSink, ObjectSinkConfig


def _df(spark, n=50, off=0):
    return spark.range(off, off + n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def test_jsonl_roundtrip_and_manifest(spark, workdir):
    sink = ObjectSink(spark, os.path.join(workdir, "objs"))
    m = sink.write_batch(_df(spark), "s1", "b1")
    assert m["rows"] == 50 and m["seq"] == 0 and m["objects"]
    got = sink.read("s1")
    assert got.count() == 50
    assert {r["k"] for r in got.collect()} == set(range(50))


def test_idempotent_redelivery(spark, workdir):
    sink = ObjectSink(spark, os.path.join(workdir, "objs"))
    m1 = sink.write_batch(_df(spark), "s1", "b1")
    m2 = sink.write_batch(_df(spark, n=999), "s1", "b1")  # re-delivered id
    assert m2 == m1
    assert sink.read("s1").count() == 50  # second payload never landed


def test_csv_gzip_objects(spark, workdir):
    cfg = ObjectSinkConfig(fmt="csv", compression="gzip", csv_delimiter="|")
    sink = ObjectSink(spark, os.path.join(workdir, "objs"), cfg)
    sink.write_batch(_df(spark, n=10), "s1", "b1")
    objs = sink.live_manifests("s1")[0]["objects"]
    assert all(o.endswith(".gz") for o in objs)
    # the object really is gzip csv with the dialect applied
    with gzip.open(os.path.join(sink.root, objs[0]), "rt") as f:
        header = f.readline().strip()
    assert header == "k|v"
    assert sink.read("s1").count() == 10


def test_parquet_and_gzip_rejected(spark, workdir):
    with pytest.raises(ValueError, match="gzip is a text codec"):
        ObjectSinkConfig(fmt="parquet", compression="gzip")
    sink = ObjectSink(spark, os.path.join(workdir, "objs"),
                      ObjectSinkConfig(fmt="parquet"))
    sink.write_batch(_df(spark, n=7), "s1", "b1")
    assert sink.read("s1").count() == 7


def test_overwrite_generation_and_vacuum(spark, workdir):
    sink = ObjectSink(spark, os.path.join(workdir, "objs"))
    sink.write_batch(_df(spark, n=10), "s1", "b1")
    sink.write_batch(_df(spark, n=10, off=100), "s1", "b2")
    assert sink.read("s1").count() == 20
    # full refresh: overwrite replaces history; a later append stacks on it
    sink.write_batch(_df(spark, n=5, off=500), "s1", "b3", sync_mode="overwrite")
    sink.write_batch(_df(spark, n=3, off=900), "s1", "b4")
    got = {r["k"] for r in sink.read("s1").collect()}
    assert got == set(range(500, 505)) | set(range(900, 903))
    # stale generations still on disk until vacuum
    objroot = os.path.join(sink.root, "s1", "objects")
    assert len(os.listdir(objroot)) == 4
    assert sink.vacuum("s1") == 2
    assert len(os.listdir(objroot)) == 2
    assert {r["k"] for r in sink.read("s1").collect()} == got


def test_copy_manifest(spark, workdir):
    sink = ObjectSink(spark, os.path.join(workdir, "objs"))
    sink.write_batch(_df(spark, n=4), "s1", "b1")
    cm = sink.copy_manifest("s1", url_prefix="s3://bucket/")
    assert cm["entries"] and all(
        e["url"].startswith("s3://bucket/s1/objects/") and e["mandatory"]
        for e in cm["entries"]
    )


def test_crashed_attempt_retry_no_double_count(spark, workdir):
    """Objects written but manifest missing (crash between write and
    publish): the retry of the SAME batch id overwrites in place and
    publishes once."""
    sink = ObjectSink(spark, os.path.join(workdir, "objs"))
    # simulate the crash: write objects by hand at the prefix batch seq 0
    obj_dir = os.path.join(sink.root, "s1", "objects", "000000_b1")
    _df(spark, n=99).write.mode("overwrite").format("json").save(obj_dir)
    m = sink.write_batch(_df(spark, n=10), "s1", "b1")
    assert m["rows"] == 10
    assert sink.read("s1").count() == 10


def test_streams_isolated(spark, workdir):
    sink = ObjectSink(spark, os.path.join(workdir, "objs"))
    sink.write_batch(_df(spark, n=5), "a", "b1")
    sink.write_batch(_df(spark, n=6), "b", "b1")
    assert sink.read("a").count() == 5
    assert sink.read("b").count() == 6
