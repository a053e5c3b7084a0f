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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StructType

from airbyte_spark import schemas as S

FORMATS = ("parquet", "jsonl", "csv", "avro")


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
            return flat.withColumn(
                "tokens",
                F.when(
                    F.col("tokens_csv").isNotNull() & (F.col("tokens_csv") != ""),
                    F.transform(
                        F.split(F.col("tokens_csv"), ";"), lambda x: x.cast("int")
                    ),
                ),
            ).drop("tokens_csv")
        # avro: requires the spark-avro module on the classpath; callers
        # should gate with is_avro_available()
        return self.spark.read.format("avro").load(self.path)

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
