#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation job: the §2.9b
training-data operators chained into the pipeline a pre-training corpus
actually runs, end to end over a documents parquet.

    python -m zipfile -c /tmp/airbyte_spark.zip airbyte_spark
    spark-submit --master local[8] --py-files /tmp/airbyte_spark.zip \
        jobs/curate_job.py --input /data/documents --output /data/curated

Stages (each togglable, all pure DataFrame programs — one driver-side
action per reported counter, no per-row Python anywhere):

  1. exact dedup        — md5(text) groupBy, keep min doc_id per digest
  2. fuzzy dedup        — MinHash/LSH candidates -> exact n-gram Jaccard
                          -> connected components -> drop non-keepers
  3. quality filter     — min words + max duplicated-n-gram fraction
  4. PII scrub          — email/phone redaction (text rewritten in place)
  5. split + write      — deterministic hash train/val/test, output
                          partitioned by split

Prints ONE JSON line: input/output doc counts and per-stage drop counts.
On a real cluster only --master / executor conf change; every stage's
partitioning story is documented in its operator module (fuzzy_dedup,
components, text_quality, packing).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...) "
                   "or, with --input-format docs-dir, a directory of raw document files")
    p.add_argument("--input-format", choices=("parquet", "docs-dir"), default="parquet",
                   help="docs-dir: parse md/html/txt (pdf/docx where a codec exists) "
                        "via sources/unstructured.py; parse-error files are counted "
                        "and dropped, doc_id = file uri, text = markdown content")
    p.add_argument("--output", required=True, help="curated output directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--jaccard-pct", type=int, default=50,
                   help="near-dup verification threshold (0 disables fuzzy dedup)")
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--max-dup-ngram-pct", type=int, default=80,
                   help="drop docs whose duplicated 3-gram fraction exceeds "
                        "this (after dedup; 100 disables)")
    p.add_argument("--no-exact-dedup", action="store_true")
    p.add_argument("--no-pii-scrub", action="store_true")
    p.add_argument("--train-pct", type=int, default=80)
    p.add_argument("--val-pct", type=int, default=10)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from airbyte_spark.operators.components import connected_components
    from airbyte_spark.operators.fuzzy_dedup import ngram_jaccard_pairs
    from airbyte_spark.operators.packing import hash_split
    from airbyte_spark.operators.text_quality import dup_ngram_fraction, pii_scrub
    from airbyte_spark.session import get_spark

    spark = get_spark(app_name="corpus-curate")
    ic, tc = args.id_col, args.text_col
    report: dict = {}
    if args.input_format == "docs-dir":
        from airbyte_spark.functions.markdown import strip_markdown
        from airbyte_spark.sources.unstructured import documents_as_corpus, read_documents

        parsed = read_documents(spark, args.input).persist()
        n_err = parsed.filter(F.col("_ab_source_file_parse_error").isNotNull()).count()
        report["parse_errors"] = n_err
        ic, tc = "doc_id", "text"
        docs = documents_as_corpus(parsed).withColumn(tc, strip_markdown(F.col(tc)))
    else:
        docs = spark.read.parquet(args.input)
    report["input_docs"] = docs.count()

    def _stage(df):
        """Persist each stage boundary: every reported counter and the next
        stage's lineage would otherwise re-execute the whole pipeline from
        the scan (the jaccard-verify join alone dominates a re-run)."""
        nonlocal docs
        old, docs = docs, df.persist()
        n = docs.count()  # materialize before dropping the parent
        old.unpersist()
        return n

    docs = docs.persist()

    if not args.no_exact_dedup:
        keep = docs.groupBy(F.md5(tc).alias("_d")).agg(F.min(ic).alias(ic))
        # digest groupBy: 32-byte keys shuffle, never document text
        report["after_exact_dedup"] = _stage(docs.join(keep.select(ic), ic))

    if args.jaccard_pct > 0:
        pairs = ngram_jaccard_pairs(
            docs, id_col=ic, text_col=tc, jaccard_pct=args.jaccard_pct,
            log_dropped=True,
        )
        cc = connected_components(pairs)
        drops = cc.filter(F.col("doc_id") != F.col("component_id")).select(
            F.col("doc_id").alias(ic)
        )
        report["after_fuzzy_dedup"] = _stage(docs.join(drops, ic, "left_anti"))

    if args.max_dup_ngram_pct < 100 or args.min_words > 0:
        q = docs
        if args.max_dup_ngram_pct < 100:  # 100 disables the (expensive) signal
            sig = dup_ngram_fraction(docs, id_col=ic, text_col=tc)
            bad = sig.filter(F.col("dup_pct") > args.max_dup_ngram_pct).select(
                F.col("doc_id").alias(ic)
            )
            q = q.join(bad, ic, "left_anti")
        if args.min_words > 0:
            q = q.filter(F.size(F.split(F.col(tc), " ")) >= args.min_words)
        report["after_quality"] = _stage(q)

    if not args.no_pii_scrub:
        scrubbed = pii_scrub(docs, id_col=ic, text_col=tc)
        agg = scrubbed.agg(
            F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p")
        ).collect()[0]
        report["pii_emails_redacted"] = int(agg["e"] or 0)
        report["pii_phones_redacted"] = int(agg["p"] or 0)
        passthrough = [c for c in docs.columns if c not in (ic, tc)]
        docs = docs.select(ic, *passthrough).join(
            scrubbed.select(F.col("doc_id").alias(ic), F.col("scrubbed").alias(tc)), ic
        )

    out = hash_split(docs, id_col=ic, train_pct=args.train_pct, val_pct=args.val_pct)
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    final = spark.read.parquet(args.output)
    report["output_docs"] = final.count()
    report["splits"] = {
        r["split"]: r["n"] for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
