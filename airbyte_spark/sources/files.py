"""File-based changelog sources: parquet / jsonl / csv / avro.

Reference parity: the Python CDK's file-based source parsers
(`airbyte_cdk/sources/file_based/file_types/{csv,jsonl,avro,parquet}_parser
.py`) each hand-parse records and infer JSON schemas; here each format is
the built-in Spark reader with the *declared* changelog schema enforced
(never inferred on the data path — inference is a one-time discover step,
mirroring `discover` vs `read` in airbyte-protocol.md:258-336).

Scale notes: all four readers split by file/row-group and push the cursor
predicate down (parquet gets min/max pruning; text formats at least prune
whole files via partition values when the layout provides them). The
changelog contract is identical across formats, so the engine replays any
of them interchangeably.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StructType

from airbyte_spark import schemas as S

FORMATS = ("parquet", "jsonl", "csv", "avro")

#: extensions that count as data files per format (Spark writers emit these;
#: _SUCCESS markers, dotfiles and .crc sidecars are never data)
_EXTS = {"parquet": (".parquet",), "jsonl": (".json", ".jsonl"),
         "csv": (".csv",), "avro": (".avro",)}

_TS_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


@dataclass(frozen=True, order=True)
class RemoteFile:
    """A discovered source file. Ordering is (last_modified, uri) — the
    sync order, and the total order the cursor string encodes."""

    last_modified: str  # UTC wall time, _TS_FMT rendering (lexical == temporal)
    uri: str


class FileHistoryCursor:
    """Per-file sync history: which files were synced and at what mtime, so
    sync N+1 reads only NEW or MODIFIED files.

    Reference semantics (rosecape/airbyte
    `airbyte-cdk/python/airbyte_cdk/sources/file_based/stream/cursor/
    default_file_based_cursor.py:15-132`):

    - state = {"history": {uri: mtime}, "_ab_source_file_last_modified":
      "<mtime>_<uri>" of the max synced file} — the cursor string is
      display/ordering sugar; the history is authoritative.
    - a file is synced iff (a) unseen, or (b) seen with a STRICTLY newer
      mtime (equal mtime = already synced; older = clock anomaly, skipped).
    - the history is capped at ``max_history`` entries; when full, the
      earliest (mtime, uri) entry is evicted and filtering degrades to a
      bounded time window: files older than both the initial earliest
      history entry and ``now - days_window`` are skipped (at-least-once
      beats silently-missing; duplicates are absorbed downstream by the
      engine's LWW dedup).

    Spark-side difference from the reference: filtering happens as a set
    operation over the whole listing at once (one pass, no per-file Python
    in the read path) and the selected files go to ONE spark.read call as
    an explicit file list — Spark then splits them by row-group/block as
    usual. The history itself is metadata-scale (≤ max_history entries),
    carried in the engine checkpoint like any other source state.
    """

    DEFAULT_MAX_HISTORY = 10_000
    DEFAULT_DAYS_WINDOW = 3

    def __init__(
        self,
        state: dict | None = None,
        max_history: int = DEFAULT_MAX_HISTORY,
        days_window: int = DEFAULT_DAYS_WINDOW,
        now: Callable[[], datetime] = datetime.utcnow,
    ):
        if days_window <= 0:
            raise ValueError("days_window must be positive")
        self.max_history = int(max_history)
        self.days_window = timedelta(days=days_window)
        self._now = now
        self.history: dict[str, str] = dict((state or {}).get("history", {}))
        # the fallback window anchor is fixed at state-load time, like the
        # reference's _initial_earliest_file_in_history
        self._initial_earliest: RemoteFile | None = self._earliest()

    def _earliest(self) -> RemoteFile | None:
        if not self.history:
            return None
        uri, ts = min(self.history.items(), key=lambda kv: (kv[1], kv[0]))
        return RemoteFile(last_modified=ts, uri=uri)

    def _is_full(self) -> bool:
        return len(self.history) >= self.max_history

    def files_to_sync(self, listing: list[RemoteFile]) -> list[RemoteFile]:
        """The subset of the listing to sync, in (mtime, uri) order."""
        full, anchor = self._is_full(), self._initial_earliest
        window_floor = None
        if full:
            window_floor = (self._now() - self.days_window).strftime(_TS_FMT)
        out = []
        for f in listing:
            seen = self.history.get(f.uri)
            if seen is not None:
                if f.last_modified > seen:  # modified since synced
                    out.append(f)
                continue
            if not full or anchor is None:
                out.append(f)  # unseen + complete history => definitely new
                continue
            # unseen but history is lossy: sync if newer than the anchor,
            # else only if inside the time window (at-least-once fallback)
            if (f.last_modified, f.uri) > (anchor.last_modified, anchor.uri):
                out.append(f)
            elif f.last_modified >= window_floor:
                out.append(f)
        return sorted(out)

    def add_file(self, f: RemoteFile) -> None:
        self.history[f.uri] = f.last_modified
        while len(self.history) > self.max_history:
            oldest = self._earliest()
            del self.history[oldest.uri]

    def get_state(self) -> dict:
        cursor = None
        if self.history:
            uri, ts = max(self.history.items(), key=lambda kv: (kv[1], kv[0]))
            cursor = f"{ts}_{uri}"
        return {"history": dict(self.history),
                "_ab_source_file_last_modified": cursor}


class FileSource:
    """A bounded file-based changelog source with a declared schema."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        fmt: str = "parquet",
        schema: StructType | None = None,
    ):
        if fmt not in FORMATS:
            raise ValueError(f"format {fmt!r} not in {FORMATS}")
        self.spark = spark
        self.path = path
        self.fmt = fmt
        self.schema = schema or S.changelog_schema()

    def read(self) -> DataFrame:
        if self.fmt == "parquet":
            # mergeSchema: mid-stream additive evolution shows up as new
            # columns in later files (SURVEY.md §7.2 step 6)
            return self.spark.read.option("mergeSchema", "true").parquet(self.path)
        if self.fmt == "jsonl":
            return self.spark.read.schema(self.schema).json(self.path)
        if self.fmt == "csv":
            # CSV cannot nest arrays: tokens travel as a joined string column
            flat = self.spark.read.option("header", "true").schema(
                _csv_schema(self.schema)
            ).csv(self.path)
            return _csv_restore_arrays(flat, self.schema)
        # avro: requires the spark-avro module on the classpath; callers
        # should gate with is_avro_available()
        return self.spark.read.format("avro").load(self.path)

    # -- incremental (file-history) sync ---------------------------------

    def list_files(self) -> list[RemoteFile]:
        """Discover data files under ``path`` (recursive), sorted by
        (mtime, uri). Driver-side like Spark's own InMemoryFileIndex
        listing; the result is metadata (uri + mtime), never data."""
        exts = _EXTS[self.fmt]
        out = []
        for root, _dirs, names in os.walk(self.path):
            for n in names:
                if n.startswith((".", "_")) or not n.endswith(exts):
                    continue
                p = os.path.join(root, n)
                ts = datetime.utcfromtimestamp(os.stat(p).st_mtime).strftime(_TS_FMT)
                out.append(RemoteFile(last_modified=ts, uri=p))
        return sorted(out)

    def read_files(self, uris: list[str]) -> DataFrame:
        """Read an explicit file list (the incremental path: only the files
        the cursor selected; Spark still splits them by row-group/block)."""
        if self.fmt == "parquet":
            return self.spark.read.option("mergeSchema", "true").parquet(*uris)
        if self.fmt == "jsonl":
            return self.spark.read.schema(self.schema).json(uris)
        if self.fmt == "csv":
            flat = self.spark.read.option("header", "true").schema(
                _csv_schema(self.schema)
            ).csv(uris)
            return _csv_restore_arrays(flat, self.schema)
        return self.spark.read.format("avro").load(uris)

    def incremental_slices(
        self,
        state: dict | None = None,
        files_per_slice: int = 1000,
        cursor: FileHistoryCursor | None = None,
    ) -> Iterator[tuple[DataFrame, list[RemoteFile], dict]]:
        """Incremental sync as resumable slices: yields ``(df, files,
        new_state)`` per slice of ≤ files_per_slice new/changed files, in
        (mtime, uri) order. The caller commits ``new_state`` AFTER durably
        writing the slice (the engine's batch-id gate makes the replay of a
        half-committed slice idempotent) — so a kill mid-sync resumes at
        the first uncommitted slice, never re-reading committed files and
        never skipping pending ones.

        Reference parity: `default_file_based_stream.py` reads files in
        mtime order and emits state per slice; here a slice is one Spark
        read over an explicit file list.
        """
        cur = cursor or FileHistoryCursor(state)
        todo = cur.files_to_sync(self.list_files())
        for i in range(0, len(todo), files_per_slice):
            chunk = todo[i : i + files_per_slice]
            df = self.read_files([f.uri for f in chunk])
            for f in chunk:
                cur.add_file(f)
            yield df, chunk, cur.get_state()

    def incremental(self, state: dict | None = None) -> tuple[DataFrame | None, dict]:
        """One-shot incremental read: (df-or-None, new_state). None means
        no new/changed files since the given state."""
        df, new_state = None, dict(state or FileHistoryCursor(None).get_state())
        for d, _files, st in self.incremental_slices(state, files_per_slice=1 << 30):
            df, new_state = d, st
        return df, new_state

    def write(self, df: DataFrame, n_files: int = 8) -> None:
        """Materialize a changelog in this source's format (test/bench aid),
        range-partitioned by LSN so cursor scans prune files."""
        out = df.repartitionByRange(n_files, "lsn")
        if self.fmt == "parquet":
            out.write.mode("overwrite").parquet(self.path)
        elif self.fmt == "jsonl":
            out.write.mode("overwrite").json(self.path)
        elif self.fmt == "csv":
            # column order must match the declared schema: Spark CSV applies
            # a user schema positionally (enforceSchema default)
            cols = []
            for f in _csv_schema(self.schema).fields:
                if f.name.endswith("_csv"):
                    base = f.name[: -len("_csv")]
                    cols.append(F.array_join(F.col(base), ";").alias(f.name))
                else:
                    cols.append(F.col(f.name))
            out.select(*cols).write.mode("overwrite").option("header", "true").csv(self.path)
        else:
            out.write.mode("overwrite").format("avro").save(self.path)


def _csv_restore_arrays(flat: DataFrame, schema: StructType) -> DataFrame:
    """Rebuild array columns that traveled as ';'-joined strings."""
    for f in schema.fields:
        if not isinstance(f.dataType, ArrayType):
            continue
        elem = f.dataType.elementType.simpleString()
        raw = f"{f.name}_csv"
        flat = flat.withColumn(
            f.name,
            F.when(
                F.col(raw).isNotNull() & (F.col(raw) != ""),
                F.transform(F.split(F.col(raw), ";"), lambda x: x.cast(elem)),
            ),
        ).drop(raw)
    return flat


def _csv_schema(schema: StructType) -> StructType:
    """The declared schema with array columns flattened to delimited strings."""
    from pyspark.sql.types import StringType, StructField

    out = []
    for f in schema.fields:
        if isinstance(f.dataType, ArrayType):
            out.append(StructField(f"{f.name}_csv", StringType(), True))
        else:
            out.append(f)
    return StructType(out)


def is_avro_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent-path-probe")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        return "AVRO" not in msg.upper() or "Path does not exist" in msg
    return True


def open_changelog(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: StructType | None = None
) -> DataFrame:
    """One-call reader used by the engine: CdcEngine.replay(open_changelog(...))."""
    return FileSource(spark, path, fmt, schema).read()
