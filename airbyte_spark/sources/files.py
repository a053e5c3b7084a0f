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


@dataclass(frozen=True)
class CsvFormat:
    """CSV dialect options, mirroring the reference's
    `airbyte-cdk/python/airbyte_cdk/sources/file_based/config/csv_format.py`
    (delimiter/quote/escape/encoding/double_quote/null_values/
    strings_can_be_null/skip_rows_before_header/skip_rows_after_header/
    header_definition/true_values/false_values).

    Execution strategy (Spark-first, three tiers):

    1. Pure reader options (delimiter, quote, escape, double-quote, encoding,
       header, ≤1 null value) → the native splittable Spark CSV scan with the
       typed schema pushed down. The common path; whole-stage codegen.
    2. Multiple null values / true-false lists → native scan with an
       all-strings schema, then a vectorized ``isin``-nullify + cast
       projection (still JVM-side, one extra projection, no Python).
    3. ``skip_rows_*`` preambles → per-file pandas parse via ``mapInPandas``
       over the file list (Arrow-batched; parallel BY FILE, exactly how the
       reference's per-file parser and any non-splittable codec scales —
       preamble-skipping is inherently a per-file-prefix operation).
    """

    delimiter: str = ","
    quote_char: str = '"'
    escape_char: str | None = None
    double_quote: bool = True
    encoding: str = "utf-8"
    null_values: tuple[str, ...] = ()
    strings_can_be_null: bool = True
    skip_rows_before_header: int = 0
    skip_rows_after_header: int = 0
    header_definition: str = "from_csv"  # from_csv | autogenerated | user_provided
    column_names: tuple[str, ...] = ()  # for header_definition=user_provided
    true_values: tuple[str, ...] = ()
    false_values: tuple[str, ...] = ()

    def __post_init__(self):
        if len(self.delimiter) != 1:
            raise ValueError("delimiter must be a single character")
        if len(self.quote_char) != 1:
            raise ValueError("quote_char must be a single character")
        if self.escape_char is not None and len(self.escape_char) != 1:
            raise ValueError("escape_char must be a single character")
        if self.header_definition not in ("from_csv", "autogenerated", "user_provided"):
            raise ValueError(f"unknown header_definition {self.header_definition!r}")
        if self.header_definition == "user_provided" and not self.column_names:
            raise ValueError("user_provided header needs column_names")
        if self.skip_rows_before_header < 0 or self.skip_rows_after_header < 0:
            raise ValueError("skip_rows_* must be >= 0")

    # -- tier selection ---------------------------------------------------

    def needs_string_pass(self) -> bool:
        """True when values must be read as strings and mapped JVM-side."""
        return (
            len(self.null_values) > 1
            # native nullValue applies to every column; when string columns
            # must keep literal null tokens, mapping has to be per-column
            or (bool(self.null_values) and not self.strings_can_be_null)
            or bool(self.true_values)
            or bool(self.false_values)
        )

    def needs_per_file_parse(self) -> bool:
        """True when the dialect needs the per-file pandas parser (tier 3)."""
        return self.skip_rows_before_header > 0 or self.skip_rows_after_header > 0

    def spark_options(self) -> dict[str, str]:
        """The dialect rendered as native Spark CSV reader options."""
        esc = self.escape_char
        if esc is None:
            # RFC-4180 doubled quotes ("" inside a quoted field) are
            # expressed in univocity as escape == quote
            esc = self.quote_char if self.double_quote else "\\"
        opts = {
            "sep": self.delimiter,
            "quote": self.quote_char,
            "escape": esc,
            "encoding": self.encoding,
            "header": "true" if self.header_definition == "from_csv" else "false",
            "mode": "PERMISSIVE",
        }
        if len(self.null_values) == 1:
            opts["nullValue"] = self.null_values[0]
        return opts


#: reference schema-validation policies (file_based/schema_validation_
#: policies/default_schema_validation_policies.py:13-41) -> Spark reader
#: parse modes. emit_record = keep every record, nonconforming values null
#: out (PERMISSIVE); skip_record = drop records that do not conform
#: (DROPMALFORMED); wait_for_discover = stop the sync on the first
#: nonconforming record (FAILFAST — the StopSyncPerValidationPolicy analog).
VALIDATION_POLICIES = {
    "emit_record": "PERMISSIVE",
    "skip_record": "DROPMALFORMED",
    "wait_for_discover": "FAILFAST",
}


class FileSource:
    """A bounded file-based changelog source with a declared schema.

    ``validation_policy`` carries the reference's schema-validation
    policies (see VALIDATION_POLICIES): for the text formats (csv/jsonl)
    it maps ONTO Spark's native parse modes — conformance checking is
    JVM-side, zero extra passes; the dialect tiers that read all-strings
    (multi-token value maps / preamble skipping) enforce the same policy
    on the typed-cast projection instead. Parquet/avro files are
    self-describing (the schema travels with the data), so nonconformance
    there is a schema-evolution event, not a per-record one — the engine's
    evolution path owns it, exactly like the reference's parquet parser
    never consults the policy per record."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        fmt: str = "parquet",
        schema: StructType | None = None,
        csv_format: CsvFormat | None = None,
        validation_policy: str = "emit_record",
    ):
        if fmt not in FORMATS:
            raise ValueError(f"format {fmt!r} not in {FORMATS}")
        if validation_policy not in VALIDATION_POLICIES:
            raise ValueError(
                f"validation_policy {validation_policy!r} not in "
                f"{sorted(VALIDATION_POLICIES)}"
            )
        self.spark = spark
        self.path = path
        self.fmt = fmt
        self.schema = schema or S.changelog_schema()
        self.csv_format = csv_format or CsvFormat()
        self.validation_policy = validation_policy

    def read(self) -> DataFrame:
        if self.fmt == "parquet":
            # mergeSchema: mid-stream additive evolution shows up as new
            # columns in later files (SURVEY.md §7.2 step 6)
            return self.spark.read.option("mergeSchema", "true").parquet(self.path)
        if self.fmt == "jsonl":
            return self._read_jsonl([self.path])
        if self.fmt == "csv":
            return self._read_csv([self.path])
        return self._read_avro([self.path])

    def _read_jsonl(self, paths: list[str]) -> DataFrame:
        """Typed JSONL read with the validation policy as the native parse
        mode (conformance checked inside the JVM scan, no extra pass)."""
        return (
            self.spark.read.schema(self.schema)
            .option("mode", VALIDATION_POLICIES[self.validation_policy])
            .json(paths)
        )

    def _read_csv(self, paths: list[str]) -> DataFrame:
        """Dialect-aware CSV read (see CsvFormat for the tier strategy).
        Array columns travel as ';'-joined strings (CSV cannot nest)."""
        from pyspark.sql.types import StringType, StructField

        fmt = self.csv_format
        flat_schema = _csv_schema(self.schema)
        if fmt.header_definition == "user_provided":
            # headerless file; column_names give the FILE's column order,
            # possibly different from the declared schema — read strings
            # positionally, then select/cast into declared order by name
            read_schema = StructType(
                [StructField(n, StringType(), True) for n in fmt.column_names]
            )
            string_pass = True
        elif fmt.needs_string_pass() or fmt.needs_per_file_parse():
            read_schema = _all_strings(flat_schema)
            string_pass = True
        else:
            read_schema = flat_schema
            string_pass = False
        mode = VALIDATION_POLICIES[self.validation_policy]
        if fmt.needs_per_file_parse():
            flat = _csv_per_file_parse(self.spark, paths, fmt, read_schema)
        else:
            opts = fmt.spark_options()
            if string_pass:
                # null/bool token mapping happens in the typed projection;
                # the read itself must hand every token through verbatim
                # (the all-strings read cannot fail a cast, so the policy
                # is enforced on the typed projection below instead)
                opts.pop("nullValue", None)
            else:
                # tier 1: the policy IS the native parse mode
                opts["mode"] = mode
            flat = self.spark.read.options(**opts).schema(read_schema).csv(paths)
        if string_pass:
            flat = _csv_apply_value_maps(flat, fmt, flat_schema)
            if self.validation_policy != "emit_record":
                flat = _enforce_policy(flat, self.validation_policy)
            else:
                flat = flat.drop("_nonconforming")
        return _csv_restore_arrays(flat, self.schema)

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
            return self._read_jsonl(uris)
        if self.fmt == "csv":
            return self._read_csv(uris)
        return self._read_avro(uris)

    def _read_avro(self, paths: list[str]) -> DataFrame:
        """spark-avro when on the classpath (JVM-side, vectorized,
        splittable); otherwise the pure-Python container fallback
        (sources/avro_py.py — per-file tasks, Arrow-batched mapInPandas;
        the read logs which path served it)."""
        if is_avro_available(self.spark):
            return self.spark.read.format("avro").load(paths)
        from airbyte_spark.sources.avro_py import read_avro_fallback

        return read_avro_fallback(self.spark, paths)

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
        elif is_avro_available(self.spark):
            out.write.mode("overwrite").format("avro").save(self.path)
        else:
            from airbyte_spark.sources.avro_py import write_avro_fallback

            # sort so the range partitioning survives the driver-side
            # collect (fixture writer; see avro_py.write_avro_fallback)
            write_avro_fallback(out.sortWithinPartitions("lsn"), self.path, n_files)


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


def _all_strings(schema: StructType) -> StructType:
    """The same field names, every type widened to string (tier-2 read)."""
    from pyspark.sql.types import StringType, StructField

    return StructType([StructField(f.name, StringType(), True) for f in schema.fields])


def _csv_apply_value_maps(flat: DataFrame, fmt: CsvFormat, flat_schema: StructType) -> DataFrame:
    """Vectorized null/bool token mapping + cast from an all-strings frame
    into the declared flat schema — one JVM-side projection, no Python.
    A ``_nonconforming`` flag rides along (true iff any column had a
    non-null raw token the declared type could not absorb) so the
    validation policy can enforce without a second raw read; the caller
    drops it."""
    from pyspark.sql.types import BooleanType, StringType

    cols = []
    bad = F.lit(False)
    for f in flat_schema.fields:
        raw = F.col(f.name)
        # try_cast, not cast: under ANSI mode (Spark 4 default) a junk
        # token would THROW mid-scan; the contract here is null-out and
        # let the validation policy decide (emit / skip / stop)
        if isinstance(f.dataType, BooleanType):
            c = raw.try_cast("boolean")
            if fmt.false_values:
                c = F.when(raw.isin(*fmt.false_values), F.lit(False)).otherwise(c)
            if fmt.true_values:
                c = F.when(raw.isin(*fmt.true_values), F.lit(True)).otherwise(c)
        else:
            c = raw.try_cast(f.dataType)
        is_string = isinstance(f.dataType, StringType)
        if fmt.null_values and (fmt.strings_can_be_null or not is_string):
            c = F.when(raw.isin(*fmt.null_values), F.lit(None)).otherwise(c)
        if not is_string and not f.name.endswith("_csv"):
            # a raw token the type could not absorb: raw present, NOT a
            # declared null token, typed null
            present = raw.isNotNull()
            if fmt.null_values:
                present = present & ~raw.isin(*fmt.null_values)
            bad = bad | (present & c.isNull())
        cols.append(c.alias(f.name))
    return flat.select(*cols, bad.alias("_nonconforming"))


def _enforce_policy(flat: DataFrame, policy: str) -> DataFrame:
    """Apply skip_record / wait_for_discover on the typed projection (the
    string-pass tiers, where the all-strings read cannot fail a cast).
    wait_for_discover costs ONE bounded probe action (limit-1) — the price
    of stop-on-first-nonconforming semantics; skip_record stays lazy."""
    if policy == "skip_record":
        return flat.filter(~F.col("_nonconforming")).drop("_nonconforming")
    bad = flat.filter(F.col("_nonconforming")).limit(1).collect()
    if bad:
        raise ValueError(
            "wait_for_discover: record does not conform to the declared "
            f"schema (StopSyncPerValidationPolicy analog): {bad[0].asDict()}"
        )
    return flat.drop("_nonconforming")


def _csv_data_files(paths: list[str]) -> list[str]:
    """Expand directories to their .csv data files (driver-side listing,
    metadata-scale — same discipline as FileSource.list_files)."""
    out = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                for n in sorted(names):
                    if not n.startswith((".", "_")) and n.endswith(_EXTS["csv"]):
                        out.append(os.path.join(root, n))
        else:
            out.append(p)
    return out


def _csv_per_file_parse(
    spark: SparkSession, paths: list[str], fmt: CsvFormat, read_schema: StructType
) -> DataFrame:
    """Tier-3 dialect parse: one pandas.read_csv per file, Arrow-batched via
    mapInPandas over the file LIST (parallel by file — preamble skipping is
    a per-file-prefix operation, so intra-file splitting cannot apply; the
    reference's csv_parser.py is per-file for the same reason). Every value
    comes back as a string; _csv_apply_value_maps does the typed cast."""
    files = _csv_data_files(paths)
    if not files:
        return spark.createDataFrame([], read_schema)
    names = [f.name for f in read_schema.fields]
    has_header = fmt.header_definition == "from_csv"
    skip_b, skip_a = fmt.skip_rows_before_header, fmt.skip_rows_after_header
    sep, quote, esc = fmt.delimiter, fmt.quote_char, fmt.escape_char
    dq, enc = fmt.double_quote, fmt.encoding

    def parse(batches):
        import pandas as pd

        for b in batches:
            for uri in b["uri"]:
                if has_header:
                    # file-line indices: preamble, then header at skip_b,
                    # then skip_a junk rows between header and data
                    skiprows = list(range(skip_b)) + list(
                        range(skip_b + 1, skip_b + 1 + skip_a)
                    )
                    header = 0
                else:
                    skiprows = list(range(skip_b + skip_a))
                    header = None
                pdf = pd.read_csv(
                    uri,
                    sep=sep,
                    quotechar=quote,
                    escapechar=esc,
                    doublequote=dq,
                    encoding=enc,
                    header=header,
                    skiprows=skiprows,
                    dtype=str,
                    keep_default_na=False,
                    na_values=[],
                )
                if len(pdf.columns) != len(names):
                    raise ValueError(
                        f"{uri}: {len(pdf.columns)} columns, schema has {len(names)}"
                    )
                pdf.columns = names  # positional, like Spark's enforceSchema
                # Spark's CSV reader renders empty fields as null (its
                # nullValue default is "") — align so tiers agree
                yield pdf.where(pdf != "", None)

    fdf = spark.createDataFrame([(u,) for u in files], "uri string").repartition(
        max(1, min(len(files), 256))
    )
    return fdf.mapInPandas(parse, schema=read_schema)


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
