"""Read-only Delta Lake transaction-log adapter (#181).

The engine's own lake format (sources/manifest.py) owns every write
path; this module lets the SAME read surface point at an EXISTING Delta
table — the most common "point it at my existing lake" ask. It speaks
the public Delta transaction-log protocol (delta.io PROTOCOL.md):

* ``_delta_log/<20-digit version>.json`` — one commit per file, one
  JSON action per line (``add`` / ``remove`` / ``metaData`` /
  ``protocol`` / ``commitInfo`` / ``txn``);
* ``_delta_log/<version>.checkpoint.parquet`` — the compacted state at
  a version (same actions as parquet structs), discovered via the
  ``_last_checkpoint`` pointer;
* snapshot at version V = replay of actions ≤ V: live files are the
  adds whose path was not removed by a LATER-OR-SAME-version remove;
* time travel = replay up to an older version.

Scope is honest and gated: reader protocol version 1 only (no deletion
vectors, no column mapping, no generated columns — ``minReaderVersion``
> 1 raises), reads only. Partition values ride in ``add.partitionValues``
(Delta files do NOT embed partition columns), so the reader re-attaches
them as typed literal columns per the table schema, exactly like the
engine's own partitioned manifest tables.

The reference has no lake format at all (it rewrites raw S3 prefixes —
DMSCDC_LoadIncremental.py:75-87); this adapter extends the Spark-first
engine the same way the manifest format does, but toward tables other
writers own.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DELTA_LOG_DIR = "_delta_log"
_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


class DeltaProtocolError(RuntimeError):
    """The table needs reader features this adapter does not implement."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _read_small_file(spark: SparkSession, path: str) -> bytes:
    jvm, fs = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    baos = jvm.java.io.ByteArrayOutputStream()
    try:
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
    finally:
        stream.close()
    return bytes(baos.toByteArray())


def list_delta_versions(spark: SparkSession, table_path: str) -> list[int]:
    """Committed versions present as JSON commit files, ascending."""
    jvm, fs = _fs(spark, table_path)
    log = jvm.org.apache.hadoop.fs.Path(
        table_path.rstrip("/") + "/" + DELTA_LOG_DIR
    )
    if not fs.exists(log):
        return []
    out = []
    for status in fs.listStatus(log):
        m = _COMMIT_RE.match(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _latest_checkpoint(spark: SparkSession, table_path: str, up_to: int):
    """(version, path) of the newest checkpoint ≤ up_to, else None.

    Prefers the ``_last_checkpoint`` pointer (the protocol's discovery
    shortcut) but falls back to a directory listing — the pointer is
    best-effort in the spec and may lag or point past ``up_to``.
    """
    jvm, fs = _fs(spark, table_path)
    log_dir = table_path.rstrip("/") + "/" + DELTA_LOG_DIR
    best = None
    ptr = jvm.org.apache.hadoop.fs.Path(log_dir + "/_last_checkpoint")
    if fs.exists(ptr):
        try:
            doc = json.loads(_read_small_file(spark, log_dir + "/_last_checkpoint"))
            v = int(doc["version"])
            if v <= up_to and doc.get("parts") is None:
                cand = f"{log_dir}/{v:020d}.checkpoint.parquet"
                if fs.exists(jvm.org.apache.hadoop.fs.Path(cand)):
                    best = (v, cand)
        except (ValueError, KeyError, json.JSONDecodeError):
            best = None  # corrupt pointer: fall through to the listing
    if best is None:
        log = jvm.org.apache.hadoop.fs.Path(log_dir)
        if fs.exists(log):
            for status in fs.listStatus(log):
                m = _CHECKPOINT_RE.match(status.getPath().getName())
                if m and int(m.group(1)) <= up_to:
                    v = int(m.group(1))
                    if best is None or v > best[0]:
                        best = (v, str(status.getPath().toUri().getPath()))
    return best


def _apply_action(state: dict, action: dict) -> None:
    if "metaData" in action:
        state["metadata"] = action["metaData"]
    elif "protocol" in action:
        state["protocol"] = action["protocol"]
    elif "add" in action:
        add = action["add"]
        state["adds"][add["path"]] = add
        state["removes"].pop(add["path"], None)
    elif "remove" in action:
        path = action["remove"]["path"]
        state["adds"].pop(path, None)
        state["removes"][path] = action["remove"]
    # commitInfo / txn / cdc: irrelevant to the live-file snapshot


def read_delta_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> dict:
    """Reconstruct the live-file snapshot at ``version`` (default: latest).

    Returns ``{"version", "files": {relpath: add_action}, "schema"
    (StructType), "partition_columns"}``. Replay starts from the newest
    checkpoint ≤ version when one exists — at a million-commit table the
    JSON tail after the checkpoint is all that is ever parsed, exactly
    the protocol's intent — and applies JSON commits after it in version
    order. Raises :class:`DeltaProtocolError` for reader features beyond
    protocol v1 and ``ValueError`` for missing/corrupt versions (a torn
    half-written commit must fail loudly, not silently truncate
    history).
    """
    versions = list_delta_versions(spark, table_path)
    any_ckpt = _latest_checkpoint(spark, table_path, 1 << 62)
    if not versions and any_ckpt is None:
        raise ValueError(f"no Delta log at {table_path}/{DELTA_LOG_DIR}")
    if version is None:
        target = max(versions) if versions else any_ckpt[0]
    else:
        target = int(version)
    state: dict = {"adds": {}, "removes": {}, "metadata": None, "protocol": None}
    start = 0
    ckpt = _latest_checkpoint(spark, table_path, target)
    if ckpt is not None:
        ck_version, ck_path = ckpt
        for row in spark.read.parquet(ck_path).collect():
            doc = row.asDict(recursive=True)
            for kind in ("metaData", "protocol", "add", "remove"):
                if doc.get(kind) is not None:
                    _apply_action(state, {kind: doc[kind]})
        start = ck_version + 1
    # Delta versions are contiguous integers; every commit in
    # (checkpoint, target] must exist as a JSON file. Log-retention
    # cleanup only ever drops commits a checkpoint already covers, so a
    # hole here is a torn or vacuumed-too-far log — fail loudly rather
    # than silently serving a partial snapshot.
    needed = list(range(start, target + 1))
    have = set(versions)
    missing = [v for v in needed if v not in have]
    if missing:
        raise ValueError(
            f"Delta log at {table_path} is missing commit(s) "
            f"{missing[:5]} needed for version {target}"
            + (" (no checkpoint covers them)" if ckpt is None else "")
        )
    log_dir = table_path.rstrip("/") + "/" + DELTA_LOG_DIR
    for v in needed:
        raw = _read_small_file(spark, f"{log_dir}/{v:020d}.json")
        for line in raw.decode("utf-8").splitlines():
            if not line.strip():
                continue
            try:
                action = json.loads(line)
            except json.JSONDecodeError as exc:
                raise ValueError(
                    f"corrupt Delta commit {v:020d}.json: {exc}"
                ) from exc
            _apply_action(state, action)
    proto = state["protocol"] or {}
    if int(proto.get("minReaderVersion", 1)) > 1:
        raise DeltaProtocolError(
            f"table requires minReaderVersion="
            f"{proto.get('minReaderVersion')} (deletion vectors / column "
            "mapping); this adapter implements reader protocol 1"
        )
    meta = state["metadata"] or {}
    schema = (
        StructType.fromJson(json.loads(meta["schemaString"]))
        if meta.get("schemaString")
        else None
    )
    return {
        "version": target,
        "files": dict(state["adds"]),
        "schema": schema,
        "partition_columns": list(meta.get("partitionColumns") or []),
    }


_CMP = {
    "=": lambda lo, hi, p: lo <= p <= hi,
    ">": lambda lo, hi, p: hi > p,
    ">=": lambda lo, hi, p: hi >= p,
    "<": lambda lo, hi, p: lo < p,
    "<=": lambda lo, hi, p: lo <= p,
}


def _delta_file_may_match(add: dict, col: str, op: str, value) -> bool:
    """Conservative skip from an add action's ``stats`` JSON
    (numRecords/minValues/maxValues — the protocol's optional per-file
    statistics). True (keep) unless the recorded [min, max] PROVES no
    row matches. Only same-domain compares decide (number vs number,
    string vs string — Delta logs temporals as ISO strings, whose
    lexicographic order IS chronological order, so string probes work
    for them too); anything else keeps the file.
    """
    raw = add.get("stats")
    if not raw:
        return True
    try:
        st = json.loads(raw) if isinstance(raw, str) else raw
        lo = (st.get("minValues") or {}).get(col)
        hi = (st.get("maxValues") or {}).get(col)
    except (ValueError, AttributeError):
        return True
    if lo is None or hi is None:
        return True
    num = isinstance(value, (int, float)) and not isinstance(value, bool)
    if num and isinstance(lo, (int, float)) and isinstance(hi, (int, float)):
        return _CMP[op](lo, hi, value)
    if isinstance(value, str) and isinstance(lo, str) and isinstance(hi, str):
        return _CMP[op](lo, hi, value)
    return True


def _delta_partition_may_match(add: dict, col: str, op: str, value) -> bool:
    """Typed prune from the add action's partitionValues (strings in
    the log; NULL partitions satisfy no comparison predicate)."""
    pv = add.get("partitionValues") or {}
    if col not in pv:
        return True
    s = pv[col]
    if s is None:
        return False
    try:
        if isinstance(value, bool):
            probe: object = s.lower() in ("true", "1")
        elif isinstance(value, int):
            probe = int(s)
        elif isinstance(value, float):
            probe = float(s)
        else:
            probe = s
    except ValueError:
        return True
    return _CMP[op](probe, probe, value)


def read_delta_table(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    predicate: tuple[str, str, object] | None = None,
) -> DataFrame:
    """The snapshot as a DataFrame — the engine-side read surface.

    Unpartitioned tables read the live files directly (one multi-path
    parquet scan; Spark still splits and prunes columns normally).
    Partitioned tables group live files by their ``partitionValues`` and
    attach each partition's values as typed literal columns (cast via
    the table schema — Delta stores them as strings in the log), so the
    result schema matches what a Delta reader serves. An empty snapshot
    returns an empty DataFrame with the table schema.

    ``predicate`` = (col, op, value), op ∈ {=, <, <=, >, >=} — the
    manifest ``read_table`` contract: files PRUNE at metadata level
    (partition values for partition columns, the add actions' optional
    ``stats`` min/max for data columns — a writer that skipped stats
    keeps its files), and the same filter applies to the surviving
    rows, so results are identical with or without statistics.
    """
    snap = read_delta_snapshot(spark, table_path, version)
    if predicate is not None:
        col, op, value = predicate
        part = col in snap["partition_columns"]
        keep = {
            p: a
            for p, a in snap["files"].items()
            if (
                _delta_partition_may_match(a, col, op, value)
                if part
                else _delta_file_may_match(a, col, op, value)
            )
        }
        snap = {**snap, "files": keep}
    schema: StructType | None = snap["schema"]
    root = table_path.rstrip("/")

    def _filtered(df: DataFrame) -> DataFrame:
        if predicate is None:
            return df
        col, op, value = predicate
        cmp = {
            "=": F.col(col) == F.lit(value),
            ">": F.col(col) > F.lit(value),
            ">=": F.col(col) >= F.lit(value),
            "<": F.col(col) < F.lit(value),
            "<=": F.col(col) <= F.lit(value),
        }[op]
        return df.where(cmp)

    if not snap["files"]:
        if schema is None:
            raise ValueError("empty Delta snapshot with no schemaString")
        return _filtered(spark.createDataFrame([], schema))
    part_cols = snap["partition_columns"]
    if not part_cols:
        paths = [f"{root}/{p}" for p in sorted(snap["files"])]
        df = spark.read.parquet(*paths)
        if schema:
            df = df.select(*[F.col(f.name) for f in schema.fields])
        return _filtered(df)

    # group by partition tuple: one scan per distinct partition value
    # set (file-compacted Delta tables keep this in the hundreds; the
    # union is metadata-only and Spark coalesces the scans)
    by_part: dict[tuple, list[str]] = {}
    for relpath, add in sorted(snap["files"].items()):
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        by_part.setdefault(key, []).append(f"{root}/{relpath}")
    type_of = {f.name: f.dataType for f in (schema.fields if schema else [])}
    data_cols = [f.name for f in schema.fields if f.name not in part_cols]
    frames = []
    for key, paths in sorted(
        by_part.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    ):
        df = spark.read.parquet(*paths).select(*data_cols)
        for c, raw in zip(part_cols, key):
            # Delta logs partition values as strings (null = NULL
            # partition); cast restores the schema type
            lit = F.lit(raw).cast(type_of[c]) if raw is not None else F.lit(
                None
            ).cast(type_of[c])
            df = df.withColumn(c, lit)
        frames.append(df.select(*[f.name for f in schema.fields]))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return _filtered(out)
