"""Manifest-gated atomic commits for unpartitioned lake tables.

Both the reference (coalesce(1) append, then boto3 deletes —
DMSCDC_LoadIncremental.py:68-87) and this repo's file-level COW have a
crash window: a reader between the append and the delete sees old AND
new copies of the merged rows. Real table formats (Delta/Iceberg) close
it with a metadata pointer; this module is the minimal form of the same
idea:

  * ``_mmanifest.json`` in the table directory lists the LIVE data
    files (plus a monotonically increasing version);
  * readers (``read_table``) load exactly the listed files — orphan
    parquet files from an interrupted write are invisible;
  * writers stage new files with a normal parquet append, then commit
    the new file list with one atomic rename, then delete superseded
    files. A crash before the commit leaves the old version intact; a
    crash after it leaves only harmless unlisted orphans —
    ``vacuum`` removes them.

Scope: unpartitioned tables (the partitioned path swaps whole partition
directories via dynamic overwrite, whose non-atomicity spans partitions
— a per-partition manifest is the same pattern, left to a real table
format). Opt-in: plain-directory readers keep working unchanged when no
manifest exists.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_mmanifest.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "/" + MANIFEST_NAME


def list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Basenames of the table's parquet data files (flat listing)."""
    jvm, fs = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isFile() and name.endswith(".parquet") and not name.startswith((".", "_")):
            out.append(name)
    return sorted(out)


def read_manifest(spark: SparkSession, path: str) -> dict | None:
    jvm, fs = _fs(spark, path)
    mp = jvm.org.apache.hadoop.fs.Path(_manifest_path(path))
    if not fs.exists(mp):
        return None
    stream = fs.open(mp)
    baos = jvm.java.io.ByteArrayOutputStream()
    try:
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
    finally:
        stream.close()
    return json.loads(bytes(baos.toByteArray()).decode("utf-8"))


def commit_manifest(spark: SparkSession, path: str, files: list[str]) -> int:
    """Atomically publish the live-file list; returns the new version.

    Write-to-temp + rename in the SAME directory — atomic on HDFS and
    POSIX; on S3-style stores swap this for a conditional PUT.
    """
    prev = read_manifest(spark, path)
    version = (prev["version"] + 1) if prev else 1
    payload = json.dumps(
        {"version": version, "files": sorted(files)}, sort_keys=True
    ).encode("utf-8")
    jvm, fs = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + f"/._mmanifest.v{version}.tmp"
    )
    out = fs.create(tmp, True)
    try:
        out.write(payload)
    finally:
        out.close()
    dst = jvm.org.apache.hadoop.fs.Path(_manifest_path(path))
    # Hadoop rename refuses to clobber; delete-then-rename is safe here
    # because the tmp write is complete — a crash between the two leaves
    # the previous version recoverable from the newest tmp.
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"manifest rename failed for {path}")
    return version


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Manifest-aware read: exactly the committed files, orphans invisible.

    Falls back to a plain directory read when the table has no manifest.
    """
    man = read_manifest(spark, path)
    if man is None:
        return spark.read.option("mergeSchema", "true").parquet(path)
    base = path.rstrip("/")
    files = [posixpath.join(base, f) for f in man["files"]]
    if not files:
        return spark.read.option("mergeSchema", "true").parquet(path).limit(0)
    return spark.read.option("mergeSchema", "true").parquet(*files)


def vacuum(spark: SparkSession, path: str) -> list[str]:
    """Delete data files not referenced by the manifest (orphans from an
    interrupted write). Returns the basenames removed."""
    man = read_manifest(spark, path)
    if man is None:
        return []
    live = set(man["files"])
    jvm, fs = _fs(spark, path)
    removed = []
    for name in list_data_files(spark, path):
        if name not in live:
            fs.delete(jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + name), False)
            removed.append(name)
    return removed
