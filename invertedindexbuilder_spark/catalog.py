"""Thin table catalog: Iceberg when configured, partitioned parquet
otherwise (SURVEY §1.3).

The engine's input contract is an Iceberg table of source files; this
sandbox has no Iceberg runtime jar (verified: pyspark 4.1.2 bundles
none), so the default backend is parquet with identical schemas and the
same call sites.  Setting ``ICEBERG_CATALOG=<catalog name>`` (with the
matching ``spark.sql.catalog.*`` configs + runtime jar on the cluster)
switches every read/write to Iceberg SQL with no code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.iceberg = os.environ.get("ICEBERG_CATALOG")

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        if self.iceberg:
            writer = df.writeTo(f"{self.iceberg}.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            # honor the mode: compaction APPENDS to the docs table —
            # createOrReplace here would silently drop the old corpus
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(f"{self.iceberg}.{name}")
        return self.spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"{self.iceberg}.{name}")
        p = self.path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS")) or (
            os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))
        )
