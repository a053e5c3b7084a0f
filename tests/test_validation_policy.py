"""Schema-validation policies (sources/files.py VALIDATION_POLICIES vs
the reference's default_schema_validation_policies.py:13-41): emit_record
keeps every record (nonconforming values null), skip_record drops
nonconforming records, wait_for_discover stops the sync on the first one
— over both the native-mode tier (jsonl / plain csv) and the string-pass
csv tier (multi-token value maps) where the policy enforces on the typed
projection."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from airbyte_spark.sources.files import CsvFormat, FileSource

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("n", IntegerType(), True),
        StructField("note", StringType(), True),
    ]
)


def _write_jsonl(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as fh:
        fh.write('{"doc_id": "a", "n": 1, "note": "ok"}\n')
        fh.write('{"doc_id": "b", "n": "NOT_A_NUMBER", "note": "bad"}\n')
        fh.write('{"doc_id": "c", "n": 3, "note": "ok"}\n')


def _write_csv(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.csv"), "w") as fh:
        fh.write("doc_id,n,note\n")
        fh.write("a,1,ok\n")
        fh.write("b,NOT_A_NUMBER,bad\n")
        fh.write("c,3,ok\n")


def test_jsonl_policies(spark, tmp_path):
    p = str(tmp_path / "jl")
    _write_jsonl(p)

    emit = FileSource(spark, p, "jsonl", SCHEMA).read()
    rows = {r["doc_id"]: r["n"] for r in emit.collect() if r["doc_id"]}
    # PERMISSIVE nulls the whole malformed record's fields in Spark JSON;
    # the record count is preserved (3 records in)
    assert emit.count() == 3

    skip = FileSource(spark, p, "jsonl", SCHEMA,
                      validation_policy="skip_record").read()
    assert {r["doc_id"] for r in skip.collect()} == {"a", "c"}

    strict = FileSource(spark, p, "jsonl", SCHEMA,
                        validation_policy="wait_for_discover").read()
    with pytest.raises(Exception):  # FAILFAST surfaces as a Spark error
        strict.collect()
    assert rows["a"] == 1 and rows["c"] == 3


def test_csv_native_tier_policies(spark, tmp_path):
    p = str(tmp_path / "cv")
    _write_csv(p)

    emit = FileSource(spark, p, "csv", SCHEMA).read()
    rows = {r["doc_id"]: r["n"] for r in emit.collect()}
    assert set(rows) == {"a", "b", "c"} and rows["b"] is None

    skip = FileSource(spark, p, "csv", SCHEMA,
                      validation_policy="skip_record").read()
    assert {r["doc_id"] for r in skip.collect()} == {"a", "c"}

    strict = FileSource(spark, p, "csv", SCHEMA,
                        validation_policy="wait_for_discover").read()
    with pytest.raises(Exception):
        strict.collect()


def test_csv_string_pass_tier_policies(spark, tmp_path):
    """Multi-token null values force the all-strings tier: the policy
    enforces on the typed projection (declared null tokens are NOT
    nonconforming; genuine junk is)."""
    p = str(tmp_path / "cv2")
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "part-0.csv"), "w") as fh:
        fh.write("doc_id,n,note\n")
        fh.write("a,1,ok\n")
        fh.write("b,N/A,declared-null\n")   # declared null token: conforming
        fh.write("x,JUNK,bad\n")
        fh.write("c,3,ok\n")
    fmt = CsvFormat(null_values=("N/A", "-"))

    emit = FileSource(spark, p, "csv", SCHEMA, csv_format=fmt).read()
    rows = {r["doc_id"]: r["n"] for r in emit.collect()}
    assert rows == {"a": 1, "b": None, "x": None, "c": 3}
    assert "_nonconforming" not in emit.columns

    skip = FileSource(spark, p, "csv", SCHEMA, csv_format=fmt,
                      validation_policy="skip_record").read()
    assert {r["doc_id"] for r in skip.collect()} == {"a", "b", "c"}

    with pytest.raises(ValueError, match="wait_for_discover"):
        FileSource(spark, p, "csv", SCHEMA, csv_format=fmt,
                   validation_policy="wait_for_discover").read().collect()


def test_unknown_policy_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="validation_policy"):
        FileSource(spark, str(tmp_path), "csv", SCHEMA,
                   validation_policy="nope")
