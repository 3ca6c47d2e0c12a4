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


HISTORY_DIR = "_mmanifest_history"


def _history_path(path: str, version: int) -> str:
    return path.rstrip("/") + f"/{HISTORY_DIR}/v{version:012d}.json"


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
    # durable per-version copy first (enables time travel), then the
    # LATEST pointer swap — the rename is still the commit point
    hist = jvm.org.apache.hadoop.fs.Path(_history_path(path, version))
    fs.mkdirs(hist.getParent())
    hout = fs.create(hist, True)
    try:
        hout.write(payload)
    finally:
        hout.close()
    dst = jvm.org.apache.hadoop.fs.Path(_manifest_path(path))
    # Hadoop rename refuses to clobber; delete-then-rename is safe here
    # because the tmp write is complete — a crash between the two leaves
    # the previous version recoverable from the newest tmp.
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"manifest rename failed for {path}")
    return version


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions with a retained history entry, ascending."""
    jvm, fs = _fs(spark, path)
    hist = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + HISTORY_DIR)
    if not fs.exists(hist):
        return []
    out = []
    for status in fs.listStatus(hist):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_json_file(spark: SparkSession, uri: str) -> dict:
    jvm, fs = _fs(spark, uri)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(uri))
    baos = jvm.java.io.ByteArrayOutputStream()
    try:
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
    finally:
        stream.close()
    return json.loads(bytes(baos.toByteArray()).decode("utf-8"))


def read_table(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Manifest-aware read: exactly the committed files, orphans invisible.

    ``version`` time-travels to an earlier commit (valid while its data
    files haven't been vacuumed). Falls back to a plain directory read
    when the table has no manifest.
    """
    if version is not None:
        man = _read_json_file(spark, _history_path(path, version))
    else:
        man = read_manifest(spark, path)
    if man is None:
        return spark.read.option("mergeSchema", "true").parquet(path)
    base = path.rstrip("/")
    files = [posixpath.join(base, f) for f in man["files"]]
    if not files:
        return spark.read.option("mergeSchema", "true").parquet(path).limit(0)
    return spark.read.option("mergeSchema", "true").parquet(*files)


def vacuum(spark: SparkSession, path: str, retain_versions: int = 1) -> list[str]:
    """Delete data files not referenced by the newest ``retain_versions``
    commits, plus the expired history entries (orphans of interrupted
    writes are unlisted everywhere, so they always go). Returns the
    data-file basenames removed."""
    man = read_manifest(spark, path)
    if man is None:
        return []
    versions = list_versions(spark, path)
    keep = set(versions[-max(retain_versions, 1):]) | {man["version"]}
    live: set[str] = set(man["files"])
    jvm, fs = _fs(spark, path)
    for v in sorted(keep):
        try:
            live |= set(_read_json_file(spark, _history_path(path, v))["files"])
        except Exception:
            pass  # history entry may predate retention or be gone
    removed = []
    for name in list_data_files(spark, path):
        if name not in live:
            fs.delete(jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + name), False)
            removed.append(name)
    for v in versions:
        if v not in keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(_history_path(path, v)), False)
    return removed
