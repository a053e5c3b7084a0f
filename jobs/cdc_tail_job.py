#!/usr/bin/env python
"""spark-submit entry point for the wire-format CDC tail job.

The missing first mile of ``replay_job.py``: that job replays an
already-typed changelog; THIS one starts from the raw wire — a directory
of JSON-lines files holding Debezium/Mongo change-event envelopes exactly
as a Kafka-topic dump lands them (one object per line: ``value`` = the
envelope JSON, optional ``key`` = the event key JSON, optional
``partition`` = the Kafka partition) — decodes them connector-appropriately
(``sources/debezium.py`` for postgres/mysql, ``sources/mongo.py`` for
mongo, incl. ``--update-mode patch`` for change streams without
full-document lookup, ``sources/wal2json.py`` for transaction-grouped
wal2json output with commit-aligned replay windows by default),
quarantines undecodable lines to a parquet side
path (never silently dropped, never poisoning the replay), and replays the
good rows through the engine with the usual exactly-once checkpointing:

    python -m zipfile -c /tmp/airbyte_spark.zip airbyte_spark
    spark-submit --master local[8] --py-files /tmp/airbyte_spark.zip \\
        jobs/cdc_tail_job.py --lake /data/lake --wire /data/kafka_dump \\
        --connector postgres --payload-ddl "doc_id string, tokens array<int>, n_tok int, source string"

Scale shape: the decode is pure projection (typed from_json, whole-stage
codegen) fused into the same scan the replay batches — no extra pass over
the wire; the quarantine split is one filter each way. Re-submitting after
a crash resumes from the checkpoint (LSN-range batch ids), identical to
replay_job.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lake", required=True, help="lake root (table + checkpoint)")
    p.add_argument("--wire", required=True,
                   help="directory of JSON-lines Kafka-dump files "
                        "({value, key?, partition?} per line)")
    p.add_argument("--connector", required=True,
                   choices=["postgres", "mysql", "mongo", "wal2json",
                            "maxwell", "canal", "dms"])
    p.add_argument("--lsn-align-bits", type=int, default=None,
                   help="LSN packs (commit_lsn << bits | statement_index) "
                        "(wal2json/maxwell/canal: 16): align replay-window "
                        "bounds "
                        "to commit boundaries so no source transaction "
                        "splits across two destination commits")
    p.add_argument("--txn-markers", default=None,
                   help="postgres/mysql: JSONL dir of the Debezium "
                        "transaction-metadata topic (provide.transaction."
                        "metadata); replay only transactions whose END "
                        "marker + event count confirm completeness "
                        "(bounded replay only)")
    p.add_argument("--txn-collection", default=None,
                   help="with --txn-markers: this topic carries ONE table "
                        "of multi-table transactions — gate on its "
                        "data_collections entry instead of the END's "
                        "cross-table total")
    p.add_argument("--connect-wrapper", action="store_true",
                   help="postgres/mysql: unwrap Kafka Connect JSONConverter "
                        "schemas.enable=true messages ({schema, payload}) — "
                        "same single typed parse, in-band schema blob ignored")
    p.add_argument("--maxwell-use-position", action="store_true",
                   help="maxwell: order by the binlog position field instead "
                        "of the xid fallback (requires output_binlog_position "
                        "on the wire)")
    p.add_argument("--payload-ddl", default=None,
                   help="payload schema as DDL ('name type, ...'); optional "
                        "when the lake table already exists (derived from it)")
    p.add_argument("--pk", default="doc_id", help="primary-key payload column")
    p.add_argument("--mongo-id-field", default="_id",
                   help="mongo document id field in the payload schema; "
                        "renamed to --pk for the engine when they differ")
    p.add_argument("--update-mode", default="full", choices=["full", "patch", "token_append"],
                   help="patch: mongo updateDescription-only updates fold "
                        "column-wise (StreamConfig.update_mode)")
    p.add_argument("--quarantine", default=None,
                   help="parquet path for undecodable wire lines "
                        "(default <lake>/_quarantine)")
    p.add_argument("--batch-events", type=int, default=1_000_000)
    p.add_argument("--num-buckets", type=int, default=32)
    p.add_argument("--validate-tokens", action="store_true",
                   help="run the token validator (requires tokens/n_tok cols)")
    p.add_argument("--vocab-size", type=int, default=50_257)
    p.add_argument("--streaming", action="store_true",
                   help="drain via Structured Streaming (availableNow) — "
                        "offsets live in --ss-checkpoint; quarantine is "
                        "banked per epoch (idempotent on redelivery)")
    p.add_argument("--ss-checkpoint", default=None,
                   help="Structured Streaming checkpointLocation "
                        "(required with --streaming)")
    return p


def run(spark, args) -> dict:
    """Decode + replay with an existing SparkSession; returns replay stats.

    Split from ``main`` so tests (and notebook users) can drive the job
    in-process without the session lifecycle."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from airbyte_spark.config import EngineConfig, StreamConfig
    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.sources.debezium import decode_debezium, split_malformed

    eng = CdcEngine(
        spark,
        args.lake,
        StreamConfig(
            num_buckets=args.num_buckets,
            primary_key=args.pk,
            update_mode=args.update_mode,
        ),
        EngineConfig(
            batch_events=args.batch_events,
            validate_tokens=args.validate_tokens,
            vocab_size=args.vocab_size,
            lsn_align_bits=(
                args.lsn_align_bits
                if args.lsn_align_bits is not None
                else (
                    16
                    if args.connector in ("wal2json", "maxwell", "canal")
                    else None
                )
            ),
        ),
    )
    if not LakeTable.exists(eng.table_root):
        eng.create_table(_table_schema_from_ddl(args))

    wire_schema = StructType(
        [
            StructField("value", StringType(), True),
            StructField("key", StringType(), True),
            StructField("partition", LongType(), True),
            # optional wire sequence (e.g. Kinesis sequence number / dump
            # line number) — DMS needs it to break same-microsecond ties;
            # absent in the dump -> NULL -> seq 0
            StructField("seq", LongType(), True),
        ]
    )
    streaming = getattr(args, "streaming", False)
    if streaming:
        if not args.ss_checkpoint:
            raise SystemExit("--streaming requires --ss-checkpoint")
        wire = spark.readStream.schema(wire_schema).json(args.wire)
    else:
        wire = spark.read.schema(wire_schema).json(args.wire)

    # In-stream DDL: Debezium schema-change envelopes (tableChanges) evolve
    # the table BEFORE the data decode, so the DML from_json uses the final
    # (widest) payload schema — additive evolution makes early-apply sound
    # (pre-DDL envelopes parse to NULL for the new column; widened columns
    # parse old narrower values exactly). Streaming uses a bounded batch
    # pre-pass over the same dump for the (metadata-scale) DDL side and
    # filters those lines out of the stream.
    n_ddl = 0
    if args.connector in ("postgres", "mysql"):
        from airbyte_spark.sources.schema_change import (
            decode_schema_changes,
            split_schema_changes,
        )

        if streaming:
            sc_lines, _ = split_schema_changes(
                spark.read.schema(wire_schema).json(args.wire)
            )
            _, wire = split_schema_changes(wire)
        else:
            sc_lines, wire = split_schema_changes(wire)
        changes = decode_schema_changes(sc_lines, connector=args.connector)
        n_bad_ddl = changes.filter(F.col("change_type").isNull()).count()
        if n_bad_ddl:
            from airbyte_spark.lineage import log_metric

            log_metric("ddl_quarantined", rows=n_bad_ddl)
        n_ddl = eng.apply_schema_changes(
            changes.filter(F.col("change_type").isNotNull())
        )
    elif args.connector == "maxwell":
        # Maxwell output_ddl: table-create/alter envelopes carry the full
        # post-change column list under def.columns — same fold, same
        # early-apply soundness argument as the Debezium branch
        from airbyte_spark.sources.maxwell import decode_ddl, split_ddl

        if streaming:
            ddl_lines, _ = split_ddl(
                spark.read.schema(wire_schema).json(args.wire)
            )
            _, wire = split_ddl(wire)
        else:
            ddl_lines, wire = split_ddl(wire)
        changes = decode_ddl(ddl_lines)
        n_bad_ddl = changes.filter(F.col("change_type").isNull()).count()
        if n_bad_ddl:
            from airbyte_spark.lineage import log_metric

            log_metric("ddl_quarantined", rows=n_bad_ddl)
        n_ddl = eng.apply_schema_changes(
            changes.filter(F.col("change_type").isNotNull())
        )
    elif args.connector == "canal":
        # Canal DDL envelopes carry only the raw SQL text (no structured
        # post-change column list), so they cannot drive the additive-
        # evolution fold; split them off the data stream and surface the
        # count — operators re-discover the schema (or pass --payload-ddl)
        # after a DDL point. decode_canal would quarantine them anyway;
        # splitting keeps the malformed count meaningful.
        from airbyte_spark.sources.canal import split_ddl as _canal_split

        if streaming:
            ddl_lines, _ = _canal_split(
                spark.read.schema(wire_schema).json(args.wire)
            )
            _, wire = _canal_split(wire)
        else:
            ddl_lines, wire = _canal_split(wire)
        n_canal_ddl = ddl_lines.count()
        if n_canal_ddl:
            from airbyte_spark.lineage import log_metric

            log_metric("ddl_requires_rediscover", rows=n_canal_ddl)

    if n_ddl:
        # DDL happened: the table snapshot now carries the final shape —
        # decode with IT, not the (stale) --payload-ddl bootstrap schema.
        from airbyte_spark import schemas as S

        snap = eng.table.snapshot()
        payload = StructType(
            [f for f in S.payload_fields(snap.schema) if f.name != "op"]
        )
    elif args.payload_ddl is not None:
        payload = StructType.fromDDL(args.payload_ddl)
    else:
        from airbyte_spark import schemas as S

        snap = eng.table.snapshot()
        payload = StructType(
            [f for f in S.payload_fields(snap.schema) if f.name != "op"]
        )
    if args.connector == "mongo" and args.mongo_id_field != args.pk:
        payload = StructType(
            [
                StructField(args.mongo_id_field, f.dataType, f.nullable)
                if f.name == args.pk
                else f
                for f in payload.fields
            ]
        )

    if args.connector == "mongo":
        from airbyte_spark.sources.mongo import decode_mongo

        decoded = decode_mongo(
            wire,
            payload,
            key_col="key",
            partition_col="partition",
            pk_field=args.mongo_id_field,
            emit_patch=args.update_mode == "patch",
        )
        if args.mongo_id_field != args.pk:
            decoded = decoded.withColumnRenamed(args.mongo_id_field, args.pk)
    elif args.connector == "wal2json":
        from airbyte_spark.sources.wal2json import decode_wal2json

        decoded = decode_wal2json(
            wire, payload, json_col="value", partition_col="partition"
        ).drop("xid", "txn_seq")
    elif args.connector == "maxwell":
        from airbyte_spark.sources.maxwell import decode_maxwell

        decoded = decode_maxwell(
            wire, payload, json_col="value", partition_col="partition",
            use_position=args.maxwell_use_position,
        )
    elif args.connector == "canal":
        from airbyte_spark.sources.canal import decode_canal

        decoded = decode_canal(
            wire, payload, json_col="value", partition_col="partition"
        )
    elif args.connector == "dms":
        from airbyte_spark.sources.dms import decode_dms

        decoded = decode_dms(
            wire, payload, json_col="value", partition_col="partition",
            seq_col="seq",
        ).drop("txn_id")
    else:
        decoded = decode_debezium(
            wire, payload, connector=args.connector,
            json_col="value", partition_col="partition",
            connect_wrapper=args.connect_wrapper,
            include_txn=args.txn_markers is not None,
        )
    n_txn_pending = 0
    if args.txn_markers is not None:
        if args.connector not in ("postgres", "mysql"):
            raise SystemExit("--txn-markers requires a Debezium connector")
        if streaming:
            raise SystemExit(
                "--txn-markers needs the bounded replay path (the gate "
                "aggregates per-transaction counts over the window)"
            )
        from airbyte_spark.sources.debezium import (
            decode_transaction_markers,
            split_complete_transactions,
        )

        markers = decode_transaction_markers(
            spark.read.schema(wire_schema).json(args.txn_markers)
        ).filter("status IS NOT NULL")
        # cache_verdict: the replay re-scans `complete` once per LSN
        # window — materialize the txn-id verdict once, not per batch
        complete, txn_pending = split_complete_transactions(
            decoded, markers,
            collection=args.txn_collection,
            cache_verdict=True,
        )
        # pending = not-yet-complete source transactions, NOT errors: they
        # stay in the topic and replay once a fuller dump arrives (batch-id
        # idempotence absorbs the overlap); only count + log them here
        n_txn_pending = txn_pending.count()
        decoded = complete.drop("_txn_id", "_txn_order")
    quarantine = args.quarantine or f"{args.lake.rstrip('/')}/_quarantine"
    if streaming:
        from airbyte_spark.streaming import stream_replay_df

        stats = stream_replay_df(
            eng, decoded, args.ss_checkpoint, quarantine=quarantine
        )
        stats["final_rows"] = eng.read_final().count()
        return stats

    good, bad = split_malformed(decoded)
    # one pass over the bad side only; good rows are consumed lazily by the
    # replay's own batched scans
    n_bad = bad.count()
    if n_bad:
        bad.write.mode("append").parquet(quarantine)

    stats = eng.replay(good)
    stats["quarantined"] = n_bad
    if args.txn_markers is not None:
        stats["txn_pending"] = n_txn_pending
    stats["final_rows"] = eng.read_final().count()
    return stats


def _table_schema_from_ddl(args):
    """First run against a fresh lake: table schema = payload DDL + engine
    metadata columns (the same layout CdcEngine.create_table defaults to)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from airbyte_spark import schemas as S

    if args.payload_ddl is None:
        raise SystemExit("--payload-ddl is required when the lake table does not exist")
    payload = StructType.fromDDL(args.payload_ddl)
    pk = args.pk
    if pk not in payload.fieldNames():
        raise SystemExit(f"--pk {pk!r} not in --payload-ddl")
    engine_tail = [
        f for f in S.tokenseq_schema().fields if f.name in S.ENGINE_COLS[1:]
    ]
    return StructType(
        list(payload.fields)
        + [StructField(S.COL_LSN, LongType(), False)]
        + engine_tail
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cdc-tail").getOrCreate()
    stats = run(spark, args)
    print(json.dumps(stats), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
