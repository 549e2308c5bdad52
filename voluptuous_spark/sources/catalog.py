"""Source/Sink abstraction: Iceberg-shaped with parquet fallback.

The north rule targets Iceberg tables at 10^12 rows; this sandbox has no
Iceberg runtime jar, so the engine is written against this thin
abstraction and configured per deployment:

- ``format='iceberg'``: ``spark.read.format('iceberg').load(ident)`` /
  ``df.writeTo(ident).append()`` — partition pruning on the table's
  partition spec (e.g. ``bucket(N, clip_id)``, ``days(ingest_ts)``) comes
  from Iceberg's metadata layer; the checkpoint module's bucket column
  should MATCH the table's bucket transform so resume prunes whole
  partitions.
- ``format='parquet'`` (sandbox default): directory-of-parquet with the
  same interface.

Everything else in the engine takes DataFrames, so the swap is a config
flip, not a code change.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Source:
    identifier: str  # iceberg table ident or parquet path
    format: str = "parquet"

    def load(self, spark: SparkSession) -> DataFrame:
        if self.format == "iceberg":
            return spark.read.format("iceberg").load(self.identifier)
        return spark.read.parquet(self.identifier)


@dataclass
class Sink:
    identifier: str
    format: str = "parquet"
    mode: str = "append"

    def write(self, df: DataFrame) -> None:
        if self.format == "iceberg":
            w = df.writeTo(self.identifier)
            (w.append() if self.mode == "append" else w.createOrReplace())
        else:
            df.write.mode(self.mode).parquet(self.identifier)


def load_table(spark: SparkSession, identifier: str,
               format: str = "parquet") -> DataFrame:
    return Source(identifier, format).load(spark)
