"""Storage layer: parquet now, Iceberg when the runtime jar is present.

BASELINE.json mandates "Iceberg tables"; this sandbox's pyspark 4.1.2 has
no iceberg-spark-runtime jar and no network, so storage goes behind this
thin interface (SURVEY.md §7 risk note): identical schema/partitioning
either way, and `table()`/`write_table()` switch to a real Iceberg
catalog transparently when `spark.sql.catalog.*` is configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameWriter, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    """Resolves logical table names to Iceberg tables or parquet paths."""

    def __init__(self, spark: SparkSession, root: str,
                 catalog_name: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.catalog_name = (
            catalog_name if catalog_name and iceberg_available(spark)
            else None
        )

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    # -- scheme-agnostic filesystem ops (parquet mode) -----------------------
    # All deletes/existence checks go through the Hadoop FileSystem API so
    # hdfs:// and s3a:// index roots behave exactly like local paths: the
    # append/compact commit protocols RELY on orphan cleanup actually
    # deleting (a silent no-op would let a retried failed append
    # double-index its generation). shutil/os.path would silently no-op on
    # any non-POSIX scheme.

    def _hadoop_fs(self, path_str: str):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = jpath.getFileSystem(
            self.spark._jsc.hadoopConfiguration())
        return fs, jpath

    def _fs_delete(self, path_str: str) -> None:
        fs, jpath = self._hadoop_fs(path_str)
        if fs.exists(jpath) and not fs.delete(jpath, True):
            raise IOError(f"failed to delete {path_str}")

    def _fs_exists(self, path_str: str) -> bool:
        fs, jpath = self._hadoop_fs(path_str)
        return bool(fs.exists(jpath))

    def table(self, name: str, schema: str | None = None) -> DataFrame:
        """schema: optional DDL string — parquet dirs written from an
        EMPTY DataFrame have no footer to infer from (0-doc corpus,
        0-row tombstone set), so readers of possibly-empty tables pass
        their known schema. Iceberg tables always carry one."""
        if self.catalog_name:
            return self.spark.table(f"{self.catalog_name}.{name}")
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self._path(name))

    def table_exists(self, name: str) -> bool:
        if self.catalog_name:
            return self.spark.catalog.tableExists(
                f"{self.catalog_name}.{name}")
        return self._fs_exists(self._path(name))

    def writer(self, df: DataFrame, name: str, mode: str = "overwrite",
               partition_by: list[str] | None = None):
        w: DataFrameWriter = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        return w

    def write_table(self, df: DataFrame, name: str, mode: str = "overwrite",
                    partition_by: list[str] | None = None) -> None:
        w = self.writer(df, name, mode, partition_by)
        if self.catalog_name:
            w.saveAsTable(f"{self.catalog_name}.{name}")
        else:
            w.parquet(self._path(name))

    def delete_partitions(self, name: str, col: str, values) -> None:
        """Remove whole partitions (orphan cleanup for the append commit
        protocol): partition-dir deletes in parquet mode, a partition-
        predicate DELETE on Iceberg."""
        values = list(values)
        if not values:
            return
        if self.catalog_name:
            # string partition values (e.g. tomb_batch) must be quoted
            # SQL literals; ints pass through bare
            in_list = ", ".join(
                "'" + str(v).replace("'", "''") + "'"
                if isinstance(v, str) else str(v)
                for v in values)
            self.spark.sql(
                f"DELETE FROM {self.catalog_name}.{name} "
                f"WHERE {col} IN ({in_list})"
            )
        else:
            for v in values:
                self._fs_delete(f"{self._path(name)}/{col}={v}")

    def drop_table(self, name: str) -> None:
        if self.catalog_name:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog_name}.{name}")
        else:
            self._fs_delete(self._path(name))
