"""Case catalog: maps a data directory to lazily-read Spark DataFrames.

Plays the role of the reference's ``ResdataFiles`` (lazy, memoizing
per-case file handle — /root/reference/src/res2df/resdatafiles.py:48-73)
for the Parquet world: one handle per "case" (directory), lazy
``spark.read.parquet`` per table, so Catalyst sees the scan directly and
can push filters/projections into it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

#: Tables the verification driver generates (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    @staticmethod
    def _normalize(name: str, df: DataFrame) -> DataFrame:
        """Per-table type normalization shared by batch and streaming
        scans (testdata vintages differ in how ``events.ts`` is stored)."""
        if name == "events":
            dtype = df.schema["ts"].dataType
            if isinstance(dtype, LongType):
                # TIMESTAMP(NANOS) read as int64 under
                # spark.sql.legacy.parquet.nanosAsLong: truncate ns → µs
                # (same truncation DuckDB applies reading the file).
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif isinstance(dtype, TimestampNTZType):
                # timestamp[us] parquet without the UTC flag reads as
                # TIMESTAMP_NTZ; the session timezone is pinned to UTC
                # (session.py), so casting to TIMESTAMP is deterministic
                # and yields the same epoch micros DuckDB reads.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    def table(self, name: str) -> DataFrame:
        """Lazy parquet scan for ``name``; memoized so repeated use in one
        query plan shares the relation."""
        if name not in self._cache:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            self._cache[name] = self._normalize(name, df)
        return self._cache[name]

    def stream_table(self, name: str) -> DataFrame:
        """Streaming scan of ``name`` — the file source with the batch
        scan's schema and the same type normalization.  The file source
        requires a directory, so the scan targets ``sf_dir`` with a glob
        pinning the one table file."""
        schema = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet").schema
        df = (
            self.spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", f"{name}.parquet")
            .load(self.sf_dir)
        )
        return self._normalize(name, df)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, prefix: str = "") -> None:
        """Register every known table as a temp view (for spark.sql use).

        Absence is probed through the Spark read itself, not
        ``os.path.exists`` — ``sf_dir`` may be an object-store or HDFS
        URI the driver's local filesystem cannot see (a local-only probe
        would silently register NOTHING on a cluster)."""
        from pyspark.errors import AnalysisException

        for name in TABLES:
            try:
                df = self.table(name)
            except AnalysisException as exc:
                cond = (
                    exc.getCondition()
                    if hasattr(exc, "getCondition")
                    else exc.getErrorClass()
                )
                # skip genuinely absent tables; anything else (corrupt
                # parquet, schema errors) must surface, not be swallowed
                if cond == "PATH_NOT_FOUND":
                    continue
                raise
            df.createOrReplaceTempView(prefix + name)
