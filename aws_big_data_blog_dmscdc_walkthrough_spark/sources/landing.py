"""Landing-zone discovery: the reference controller's S3 walk, re-done
against the Hadoop FileSystem API so the same code serves file://, s3a://
and hdfs:// URIs.

Layout (DMS convention, /root/reference/DMSCDC_Controller.py:29-43):

    <root>/<schema>/<table>/LOAD*.parquet      full-load files
    <root>/<schema>/<table>/2*.parquet         incremental CDC files
                                               (DMS names start with a
                                               timestamp, lexically
                                               ordered — LoadIncremental
                                               relies on that: line 41)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class TableFolder:
    schema: str
    table: str
    path: str  # <root>/<schema>/<table>
    initial_files: list[str] = field(default_factory=list)
    incremental_files: list[str] = field(default_factory=list)  # lexical order


def _fs_and_path(spark: SparkSession, uri: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _list_dirs(spark: SparkSession, uri: str) -> list[str]:
    fs, path = _fs_and_path(spark, uri)
    if not fs.exists(path):
        return []
    return sorted(
        s.getPath().toString()
        for s in fs.listStatus(path)
        if s.isDirectory()
    )


def _list_files(spark: SparkSession, uri: str) -> list[str]:
    fs, path = _fs_and_path(spark, uri)
    if not fs.exists(path):
        return []
    return sorted(
        s.getPath().toString()
        for s in fs.listStatus(path)
        if s.isFile()
    )


def file_mtime(spark: SparkSession, uri: str) -> int:
    """Modification time (epoch millis) — the reference compares the S3
    LastModified of the LOAD file against stored state
    (DMSCDC_ProcessTable.py:106-113)."""
    fs, path = _fs_and_path(spark, uri)
    return fs.getFileStatus(path).getModificationTime()


def discover_tables(spark: SparkSession, root: str) -> list[TableFolder]:
    """Walk <root>/<schema>/<table>/ and classify each table's files."""
    tables = []
    for schema_dir in _list_dirs(spark, root):
        schema = schema_dir.rstrip("/").rsplit("/", 1)[-1]
        for table_dir in _list_dirs(spark, schema_dir):
            table = table_dir.rstrip("/").rsplit("/", 1)[-1]
            files = _list_files(spark, table_dir)
            names = [(f, f.rsplit("/", 1)[-1]) for f in files]
            tables.append(
                TableFolder(
                    schema=schema,
                    table=table,
                    path=table_dir,
                    initial_files=[f for f, n in names if n.startswith("LOAD")],
                    incremental_files=[f for f, n in names if n.startswith("2")],
                )
            )
    return tables


def new_incremental_files(folder: TableFolder, last_file: str) -> list[str]:
    """Files lexically after the last processed one (DMSCDC_LoadIncremental.py:41-45)."""
    return [f for f in folder.incremental_files if f > last_file]
