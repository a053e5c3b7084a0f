"""End-to-end test of jobs/curate_job.py: dup-injected + PII-injected corpus
in, curated parquet out — exact copies and near-dups dropped, PII gone,
split-partitioned output."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import __spark_entry__ as E
from jobs.curate_job import main as curate_main

SF_DIR = "/root/testdata/sf0.001"


def test_curate_job_end_to_end(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    # dup-injected corpus (exact copies id%10==0, near-dups id%10==5) with
    # PII appended to a deterministic slice
    d = E._dup_docs(spark, SF_DIR)
    d = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.col("text"), F.lit(" mail me9@example.org or 555-123")),
        ).otherwise(F.col("text")),
    )
    d.write.parquet(src)
    n_in = d.count()
    n_exact_copies = d.count() - d.select(F.md5("text")).distinct().count()

    rc = curate_main(["--input", src, "--output", out, "--min-words", "3"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert report["input_docs"] == n_in
    # every exact copy group collapsed to one keeper
    assert report["after_exact_dedup"] == n_in - n_exact_copies
    # the injected 4-word-tail near-dups verify at >=50% jaccard and drop
    assert report["after_fuzzy_dedup"] < report["after_exact_dedup"]
    assert report["pii_emails_redacted"] > 0
    assert report["pii_phones_redacted"] > 0
    assert report["output_docs"] == sum(report["splits"].values())
    assert set(report["splits"]) <= {"train", "val", "test"}

    cur = spark.read.parquet(out)
    assert cur.count() == report["output_docs"]
    # no PII survives in the curated text
    assert cur.filter(F.col("text").rlike("@[a-z0-9]+[.]")).count() == 0
    assert cur.filter(F.col("text").rlike("555-[0-9]")).count() == 0
    assert cur.filter(F.col("text").contains("<EMAIL>")).count() > 0
    # curated docs are a subset of the input ids, schema carried through
    assert set(cur.columns) == set(d.columns) | {"split"}
