"""CSV dialect options (r3 verdict ask #5): a dirty CSV — ';' delimiter,
latin-1 encoding, CRLF, quoted fields containing the delimiter, NULL
tokens, preamble + post-header junk rows — replays to the same golden
table as its parquet twin.

Reference parity: `airbyte-cdk/python/airbyte_cdk/sources/file_based/
config/csv_format.py` (the option set) and `file_types/csv_parser.py`
(per-file parse semantics).
"""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.changelog import ChangelogConfig, changelog_df, seed_df
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.sources import FileSource
from airbyte_spark.sources.files import CsvFormat
from tests.util import assert_frames_equal, final_as_pandas

CFG = ChangelogConfig(n_events=400, n_seed_docs=60, dup_pct=2.0, corrupt_pct=1.0)

DIRTY = CsvFormat(
    delimiter=";",
    encoding="iso-8859-1",
    null_values=("NULL",),
    strings_can_be_null=True,
    skip_rows_before_header=2,
    skip_rows_after_header=1,
)


def _events(spark):
    """The changelog with a latin-1 character AND an embedded delimiter in
    every non-null source value (both twins get the same mutation)."""
    ev = changelog_df(spark, CFG)
    return ev.withColumn(
        "source",
        F.when(F.col("source").isNotNull(), F.concat(F.col("source"), F.lit(";é"))),
    )


def _write_dirty_csv(pdf, path):
    os.makedirs(path, exist_ok=True)
    with open(
        os.path.join(path, "part-0.csv"), "w", encoding="iso-8859-1", newline=""
    ) as fh:
        fh.write("export produced by legacy-tool v0.3\r\n")
        fh.write("do not edit;this preamble;is junk\r\n")
        w = csv.writer(fh, delimiter=";", quotechar='"', lineterminator="\r\n")
        w.writerow(
            ["op", "doc_id", "lsn", "ts_ms", "source_partition",
             "tokens_csv", "n_tok", "source"]
        )
        w.writerow(["#junk", "row", "after", "header", "", "", "", ""])

        def cell(v, joined=False):
            if v is None or (isinstance(v, float) and v != v):
                return "NULL"
            if joined:
                return ";".join(str(int(t)) for t in v)
            return v

        for r in pdf.itertuples(index=False):
            w.writerow(
                [
                    r.op,
                    r.doc_id,
                    int(r.lsn),
                    int(r.ts_ms),
                    int(r.source_partition),
                    cell(r.tokens, joined=True),
                    cell(None if r.n_tok is None or r.n_tok != r.n_tok else int(r.n_tok)),
                    cell(r.source),
                ]
            )


def test_dirty_csv_reads_equal_to_parquet_twin(spark, workdir):
    ev = _events(spark)
    pq = FileSource(spark, os.path.join(workdir, "twin_pq"), "parquet")
    pq.write(ev, n_files=2)
    _write_dirty_csv(ev.toPandas(), os.path.join(workdir, "dirty_csv"))

    got = (
        FileSource(spark, os.path.join(workdir, "dirty_csv"), "csv", csv_format=DIRTY)
        .read()
        .select(*ev.columns)
        .toPandas()
        .sort_values(["lsn", "doc_id"], ignore_index=True)
    )
    want = (
        pq.read()
        .select(*ev.columns)
        .toPandas()
        .sort_values(["lsn", "doc_id"], ignore_index=True)
    )
    assert got["source"].map(lambda s: s is None or s.endswith(";é")).all()
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_dirty_csv_replays_to_golden(spark, workdir):
    """The verdict's done-criterion: dirty CSV fixture → engine replay →
    bit-identical final table vs the parquet twin's replay."""
    ev = _events(spark)
    pq = FileSource(spark, os.path.join(workdir, "g_pq"), "parquet")
    pq.write(ev, n_files=2)
    _write_dirty_csv(ev.toPandas(), os.path.join(workdir, "g_csv"))
    csv_src = FileSource(spark, os.path.join(workdir, "g_csv"), "csv", csv_format=DIRTY)

    seed = seed_df(spark, CFG)
    finals = []
    for name, src in [("pq", pq), ("csv", csv_src)]:
        eng = CdcEngine(
            spark,
            os.path.join(workdir, f"lake_{name}"),
            StreamConfig(num_buckets=8),
            EngineConfig(batch_events=200),
        )
        eng.create_table()
        eng.bootstrap(seed)
        eng.replay(src.read().select(*ev.columns))
        finals.append(final_as_pandas(eng.read_final()))
    assert_frames_equal(finals[0], finals[1])


def test_value_maps_null_and_bool_tokens(spark, workdir):
    """Tier 2: multiple null tokens + true/false lists, JVM-side mapping."""
    schema = StructType(
        [
            StructField("id", IntegerType(), True),
            StructField("flag", BooleanType(), True),
            StructField("note", StringType(), True),
        ]
    )
    path = os.path.join(workdir, "vm_csv")
    os.makedirs(path)
    with open(os.path.join(path, "a.csv"), "w", newline="") as fh:
        fh.write("id,flag,note\n")
        fh.write("1,yes,hello\n")
        fh.write("2,no,N/A\n")
        fh.write("N/A,Y,-\n")
        fh.write("4,nope,ok\n")

    fmt = CsvFormat(
        null_values=("N/A", "-"),
        strings_can_be_null=True,
        true_values=("yes", "Y"),
        false_values=("no", "nope"),
    )
    src = FileSource(spark, path, "csv", schema=schema, csv_format=fmt)
    rows = {r["id"]: r for r in src.read().collect()}
    assert rows[1]["flag"] is True and rows[1]["note"] == "hello"
    assert rows[2]["flag"] is False and rows[2]["note"] is None
    assert rows[None]["flag"] is True and rows[None]["note"] is None
    assert rows[4]["flag"] is False and rows[4]["note"] == "ok"


def test_strings_keep_null_tokens_when_disabled(spark, workdir):
    schema = StructType(
        [
            StructField("id", IntegerType(), True),
            StructField("note", StringType(), True),
        ]
    )
    path = os.path.join(workdir, "snn_csv")
    os.makedirs(path)
    with open(os.path.join(path, "a.csv"), "w", newline="") as fh:
        fh.write("id,note\nNULL,NULL\n7,x\n")
    fmt = CsvFormat(null_values=("NULL",), strings_can_be_null=False)
    src = FileSource(spark, path, "csv", schema=schema, csv_format=fmt)
    rows = sorted(src.read().collect(), key=lambda r: (r["id"] is None, r["id"] or 0))
    assert rows[0]["id"] == 7 and rows[0]["note"] == "x"
    assert rows[1]["id"] is None and rows[1]["note"] == "NULL"  # literal kept


def test_user_provided_header_permuted_columns(spark, workdir):
    """Headerless file whose on-disk column order differs from the declared
    schema: column_names describes the file; output follows the schema."""
    schema = StructType(
        [
            StructField("id", IntegerType(), True),
            StructField("note", StringType(), True),
        ]
    )
    path = os.path.join(workdir, "up_csv")
    os.makedirs(path)
    with open(os.path.join(path, "a.csv"), "w", newline="") as fh:
        fh.write("alpha,1\nbeta,2\n")
    fmt = CsvFormat(header_definition="user_provided", column_names=("note", "id"))
    src = FileSource(spark, path, "csv", schema=schema, csv_format=fmt)
    got = sorted((r["id"], r["note"]) for r in src.read().collect())
    assert got == [(1, "alpha"), (2, "beta")]


def test_csv_format_validation():
    with pytest.raises(ValueError):
        CsvFormat(delimiter=";;")
    with pytest.raises(ValueError):
        CsvFormat(header_definition="user_provided")
    with pytest.raises(ValueError):
        CsvFormat(skip_rows_before_header=-1)
    with pytest.raises(ValueError):
        CsvFormat(header_definition="nope")
