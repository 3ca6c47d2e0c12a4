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

Partitioned tables commit through the same single manifest: ``files``
entries are paths RELATIVE to the table root (``dept=a/part-x.parquet``),
the manifest records the partition keys, and a partitioned merge appends
its rewritten partitions beside the live files then swaps ONE manifest
pointer — atomic across every touched partition, unlike dynamic
partition overwrite's directory-at-a-time swaps. ``read_table`` prunes
by partition value (parsed from the path, typed against the probe) AND
by per-file min/max stats. Merge-on-read deletion vectors remain
partitioned too: DVs address files by their manifest-relative path
(= basename on unpartitioned tables, so pre-existing DVs stay valid).

Opt-in: plain-directory readers keep working unchanged when no manifest
exists.
"""

from __future__ import annotations

import datetime as _dt
import json
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_mmanifest.json"
DELETES_DIR = "_deletes"
DV_FILE_COL = "_dv_file"
DV_POS_COL = "_dv_pos"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "/" + MANIFEST_NAME


def collapse_empty_dirs(jvm, fs, base: str, rel_dirs) -> None:
    """Delete (now-)empty partition directories left behind by file
    deletions: deepest first, each walked up at most its own depth so
    nested partition levels collapse but the table root is never
    touched. Shared by vacuum and the partitioned-merge cleanup."""
    for rel in sorted(set(rel_dirs), key=lambda s: -s.count("/")):
        p = jvm.org.apache.hadoop.fs.Path(f"{base}/{rel}")
        for _ in range(rel.count("/") + 1):
            if not (fs.exists(p) and len(fs.listStatus(p)) == 0):
                break
            fs.delete(p, False)
            p = p.getParent()


HISTORY_DIR = "_mmanifest_history"


class ConcurrentCommitError(RuntimeError):
    """A compare-and-swap commit lost the race: another writer
    committed the same next version first (or a crashed writer left
    its history entry behind — vacuum the orphan and retry)."""


def _history_path(path: str, version: int) -> str:
    return path.rstrip("/") + f"/{HISTORY_DIR}/v{version:012d}.json"


HIVE_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


def list_data_files(
    spark: SparkSession, path: str, recursive: bool = False
) -> list[str]:
    """Paths of the table's parquet data files RELATIVE to the table
    root. Flat listing by default; ``recursive`` walks partition
    directories too (hidden ``_``/``.`` entries skipped at every level),
    so a flat table yields identical output either way."""
    jvm, fs = _fs(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(root):
        return []
    out: list[str] = []

    def walk(p, prefix: str) -> None:
        for status in fs.listStatus(p):
            name = status.getPath().getName()
            if name.startswith((".", "_")):
                continue
            if status.isFile() and name.endswith(".parquet"):
                out.append(prefix + name)
            elif recursive and status.isDirectory():
                walk(status.getPath(), prefix + name + "/")

    walk(root, "")
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


def _stat_encode(v):
    """JSON-encode a min/max bound with enough type info to compare
    later: ISO strings for temporals (ISO order == chronological order),
    raw numbers / strings otherwise."""
    if isinstance(v, _dt.datetime):
        return {"t": "ts", "v": v.isoformat(sep=" ")}
    if isinstance(v, _dt.date):
        return {"t": "ts", "v": v.isoformat()}
    return v


def _stat_value(encoded, probe):
    """Decode a bound into the comparison domain of ``probe``."""
    if isinstance(encoded, dict) and encoded.get("t") == "ts":
        return encoded["v"]
    return encoded


def _probe_value(v):
    return _stat_encode(v)["v"] if isinstance(v, (_dt.date, _dt.datetime)) else v


def _pad_temporal(s):
    """Within the TEMPORAL comparison domain only: a bare date
    ``YYYY-MM-DD`` compares as midnight, matching Spark's date→timestamp
    promotion — raw lexical order would sort the 10-char date BEFORE
    every same-day timestamp and wrongly prune matching files."""
    return s + " 00:00:00" if isinstance(s, str) and len(s) == 10 else s


def compute_file_stats(
    spark: SparkSession, path: str, files: list[str], cols: list[str]
) -> dict[str, dict]:
    """Per-file min/max of ``cols`` — ONE distributed aggregation
    grouped on ``input_file_name()``, not a driver loop over footers, so
    stats collection costs a single scan however many files there are.
    Output rows are bounded by file count (small), so the collect is
    driver-safe.

    ``files`` may be partition-relative paths; output keys match the
    given names (Spark part files carry write-UUID basenames, so a
    basename maps to exactly one listed path). ``cols`` must be DATA
    columns — partition columns live in the path, not the files, and
    are pruned by partition value instead."""
    base = path.rstrip("/")
    paths = [posixpath.join(base, f) for f in files]
    if not paths or not cols:
        return {}
    by_basename = {posixpath.basename(f): f for f in files}
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    rows = (
        spark.read.option("mergeSchema", "true").parquet(*paths)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        name = posixpath.basename(r["_f"].split("?", 1)[0])
        out[by_basename.get(name, name)] = {
            c: {
                "min": _stat_encode(r[f"_min_{c}"]),
                "max": _stat_encode(r[f"_max_{c}"]),
            }
            for c in cols
        }
    return out


def stats_for_commit(
    spark: SparkSession,
    path: str,
    files: list[str],
    cols: list[str],
    prev: dict | None = None,
) -> dict[str, dict] | None:
    """Stats map for a new commit: reuse the previous manifest's stats
    for files that are still live (data files are immutable once
    written), scan ONLY the newly added ones. Keeps per-commit stats
    cost proportional to the delta, not the table."""
    if not cols:
        return None
    prev_stats = (prev or {}).get("stats", {})
    have = {f: prev_stats[f] for f in files if f in prev_stats}
    missing = [f for f in files if f not in have]
    new = compute_file_stats(spark, path, missing, cols) if missing else {}
    return {**have, **new}


def list_delete_files(spark: SparkSession, path: str) -> list[str]:
    """Basenames of parquet files under the table's ``_deletes/`` dir."""
    jvm, fs = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + DELETES_DIR)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isFile() and name.endswith(".parquet") and not name.startswith((".", "_")):
            out.append(name)
    return sorted(out)


def commit_manifest(
    spark: SparkSession,
    path: str,
    files: list[str],
    stats: dict[str, dict] | None = None,
    delete_files: list[str] | None = None,
    dv_targets: dict[str, list[str]] | None = None,
    schema_json: str | None = None,
    partition_keys: list[str] | None = None,
    properties: dict | None = None,
    expected_base_version: int | None = None,
) -> int:
    """Atomically publish the live-file list; returns the new version.

    ``expected_base_version`` turns the commit into a compare-and-swap
    (optimistic concurrency, the Delta-log pattern): the new version is
    pinned to ``expected_base_version + 1`` and the per-version history
    file is created with **overwrite=False**, so two writers that both
    read the same base race to create the SAME history path and exactly
    one create succeeds — the loser raises
    :class:`ConcurrentCommitError` before the LATEST pointer moves.
    This closes the check-then-commit window a pre-commit version
    re-read leaves open (round-13 ADVICE on fold_heavy_hitters).
    ``None`` keeps the last-writer-wins behavior every non-CAS caller
    relies on.

    ``partition_keys`` (recorded once, carried forward when ``None``)
    marks a partitioned table: ``files`` are then partition-relative
    paths and ``read_table`` prunes them by partition value.

    ``schema_json`` (``df.schema.json()``) rides along so a
    committed-EMPTY version (all rows deleted) stays readable: with no
    data files on disk a raw-directory schema inference would fail.
    ``None`` carries the previous manifest's recorded schema forward.

    Write-to-temp + rename in the SAME directory — atomic on HDFS and
    POSIX; on S3-style stores swap this for a conditional PUT.
    ``stats`` (from compute_file_stats) rides along in the manifest and
    enables file skipping in ``read_table``.

    ``delete_files`` (position-delete files under ``_deletes/``):

      * ``None`` (default) **carries forward** the previous manifest's
        delete files — the Iceberg-v2 rule that position deletes stay in
        force until the data files they reference are rewritten. An
        append/merge/compaction that doesn't pass the argument can never
        silently resurrect DV-deleted rows. Carried entries whose target
        data files (per ``dv_targets``) ALL left the live set are pruned
        — their deletes were materialized by the rewrite.
      * ``[]`` explicitly clears every delete file (a full rewrite that
        materialized all deletes).
      * a list sets the delete set exactly (the merge-on-read writer,
        :func:`delete_where`, passes carried + newly staged names).

    ``dv_targets`` maps a delete-file basename to the data-file
    basenames its rows reference — recorded at DV-commit time, it is
    what makes carry-forward pruning possible. Unknown targets keep the
    DV forever (conservative; harmless because the anti-join matches
    nothing once the data files are gone).
    """
    prev = read_manifest(spark, path)
    if expected_base_version is not None:
        prev_version = prev["version"] if prev else 0
        if prev_version != expected_base_version:
            raise ConcurrentCommitError(
                f"manifest at {path} advanced to v{prev_version} while "
                f"this writer worked from v{expected_base_version} — "
                "re-read the table state and retry"
            )
        version = expected_base_version + 1
    else:
        version = (prev["version"] + 1) if prev else 1
    prev_targets = (prev or {}).get("dv_targets") or {}
    if delete_files is None:
        live = set(files)
        carried = (prev or {}).get("delete_files") or []
        delete_files = [
            d
            for d in carried
            if not prev_targets.get(d) or any(t in live for t in prev_targets[d])
        ]
    targets_doc = {
        d: sorted({**prev_targets, **(dv_targets or {})}.get(d, []))
        for d in delete_files
        if {**prev_targets, **(dv_targets or {})}.get(d)
    }
    doc = {"version": version, "files": sorted(files)}
    schema_json = schema_json or (prev or {}).get("schema")
    if schema_json:
        doc["schema"] = schema_json
    if partition_keys is None:
        partition_keys = (prev or {}).get("partition_keys")
    if partition_keys:
        doc["partition_keys"] = list(partition_keys)
    # table properties (e.g. the SCD2 history's bucket_partitions count):
    # recorded once, carried forward when None — same contract as
    # partition_keys, so layout invariants survive commits that don't
    # know about them
    if properties is None:
        properties = (prev or {}).get("properties")
    if properties:
        doc["properties"] = dict(properties)
    if stats:
        doc["stats"] = stats
    if delete_files:
        doc["delete_files"] = sorted(delete_files)
    if targets_doc:
        doc["dv_targets"] = targets_doc
    payload = json.dumps(doc, sort_keys=True).encode("utf-8")
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
    # LATEST pointer swap — the rename is still the commit point.
    # Under expected_base_version the history create is ALSO the CAS
    # point: overwrite=False makes two same-base writers collide on
    # this one path, and Hadoop create(path, false) raises for the
    # loser before its LATEST rename can clobber the winner's.
    hist = jvm.org.apache.hadoop.fs.Path(_history_path(path, version))
    fs.mkdirs(hist.getParent())
    try:
        hout = fs.create(hist, expected_base_version is None)
    except Exception as exc:  # py4j surfaces FileAlreadyExists here
        if expected_base_version is not None:
            raise ConcurrentCommitError(
                f"lost the commit race for v{version} at {path}: "
                f"another writer (or a crashed one's orphan history "
                f"entry) holds {_history_path(path, version)} — retry "
                f"from a fresh read_manifest ({exc.__class__.__name__})"
            ) from exc
        raise
    try:
        hout.write(payload)
    finally:
        hout.close()
    dst = jvm.org.apache.hadoop.fs.Path(_manifest_path(path))
    # ATOMIC pointer swap: FileContext.rename with OVERWRITE replaces
    # the manifest in one metadata op — delete-then-rename would open a
    # window with NO manifest at all, during which a concurrent reader
    # falls back to the raw directory (duplicates + resurrected DV
    # deletes) and a crash makes that state stick. Plain FileSystem
    # rename refuses to clobber, hence FileContext.
    fctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri(), spark._jsc.hadoopConfiguration()
    )
    overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    renames = spark.sparkContext._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    renames[0] = overwrite
    fctx.rename(tmp, dst, renames)
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


def _file_may_match(fstats: dict | None, col: str, op: str, value) -> bool:
    """Conservative skip decision from a file's [min, max] for ``col``.

    True (keep the file) unless the stats PROVE no row can satisfy the
    predicate. Missing stats or None bounds keep the file. Rows with
    NULL in ``col`` never satisfy a comparison predicate, so a file
    whose non-null range excludes it is safe to skip even if it also
    holds nulls (min/max ignore nulls).
    """
    if not fstats or col not in fstats:
        return True
    lo_e, hi_e = fstats[col].get("min"), fstats[col].get("max")
    if lo_e is None or hi_e is None:
        return True
    probe = _probe_value(value)
    lo, hi = _stat_value(lo_e, probe), _stat_value(hi_e, probe)
    temporal = isinstance(value, (_dt.date, _dt.datetime)) or (
        isinstance(lo_e, dict) and lo_e.get("t") == "ts"
    )
    if temporal:  # mixed date/timestamp bounds normalize to one domain
        probe, lo, hi = _pad_temporal(probe), _pad_temporal(lo), _pad_temporal(hi)
    if op == "=":
        return lo <= probe <= hi
    if op == ">":
        return hi > probe
    if op == ">=":
        return hi >= probe
    if op == "<":
        return lo < probe
    if op == "<=":
        return lo <= probe
    raise ValueError(f"unsupported prune op {op!r}")


def _partition_values(relpath: str) -> dict[str, str | None]:
    """Hive partition values parsed from a partition-relative file path
    (``dept=a%20b/part-x.parquet`` → ``{"dept": "a b"}``); the
    ``__HIVE_DEFAULT_PARTITION__`` sentinel decodes to None."""
    from urllib.parse import unquote

    out: dict[str, str | None] = {}
    for seg in relpath.split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = None if v == HIVE_NULL_PART else unquote(v)
    return out


def _partition_may_match(relpath: str, col: str, op: str, value) -> bool:
    """Conservative partition-value prune from the file's path alone.

    The path value is a string; it is coerced into the probe's domain
    (int/float/bool parse, temporal padding) before comparing — a raw
    lexical compare would mis-order numerics (``"10" < "9"``). Coercion
    failure or an absent key keeps the file. A NULL partition value
    (``__HIVE_DEFAULT_PARTITION__``) satisfies no comparison predicate,
    so those files prune away — ``_apply_predicate`` would drop every
    row anyway."""
    vals = _partition_values(relpath)
    if col not in vals:
        return True
    s = vals[col]
    if s is None:
        return False
    probe = _probe_value(value)
    try:
        if isinstance(value, bool):
            pv = s.lower() in ("true", "1")
        elif isinstance(value, int):
            pv = int(s)
        elif isinstance(value, float):
            pv = float(s)
        elif isinstance(value, (_dt.date, _dt.datetime)):
            pv, probe = _pad_temporal(s), _pad_temporal(probe)
        else:
            pv = s
    except ValueError:
        return True
    if op == "=":
        return pv == probe
    if op == ">":
        return pv > probe
    if op == ">=":
        return pv >= probe
    if op == "<":
        return pv < probe
    if op == "<=":
        return pv <= probe
    raise ValueError(f"unsupported prune op {op!r}")


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    predicate: tuple[str, str, object] | None = None,
) -> DataFrame:
    """Manifest-aware read: exactly the committed files, orphans invisible.

    ``version`` time-travels to an earlier commit (valid while its data
    files haven't been vacuumed). Falls back to a plain directory read
    when the table has no manifest.

    ``predicate`` = (col, op, value) with op in {=, <, <=, >, >=} both
    PRUNES files whose manifest min/max stats prove they can't match —
    the planner never even opens them, the metadata-level skipping that
    makes selective scans at 100 TB cheap — and applies the same filter
    to the surviving rows, so results are identical with or without
    stats. On a partitioned table a predicate on a partition key prunes
    by the partition value parsed from each file's path (typed compare),
    and data-column stats prune within the surviving partitions.
    """
    if version is not None:
        man = _read_json_file(spark, _history_path(path, version))
    else:
        man = read_manifest(spark, path)
    if man is None:
        df = spark.read.option("mergeSchema", "true").parquet(path)
        return _apply_predicate(df, predicate)
    base = path.rstrip("/")
    names = list(man["files"])
    part_keys = man.get("partition_keys") or []
    if predicate is not None:
        stats = man.get("stats", {})
        col, op, value = predicate
        if col in part_keys:
            names = [n for n in names if _partition_may_match(n, col, op, value)]
        else:
            names = [
                n for n in names if _file_may_match(stats.get(n), col, op, value)
            ]
    files = [posixpath.join(base, f) for f in names]
    if not files:
        return _apply_predicate(_empty_frame(spark, path, man), predicate)
    reader = spark.read.option("mergeSchema", "true")
    if part_keys:
        # basePath keeps the partition columns in the projection when
        # reading an explicit file list
        reader = reader.option("basePath", base)
    df = reader.parquet(*files)
    dv = read_deletion_vectors(spark, path, man)
    if dv is not None:
        df = apply_deletion_vectors(df, dv, len(part_keys))
    return _apply_predicate(df, predicate)


def _empty_frame(spark: SparkSession, path: str, man: dict) -> DataFrame:
    """Zero-row frame in the table's schema. Prefers the schema recorded
    in the manifest (survives ALL data files being deleted+vacuumed);
    falls back to raw-directory inference for manifests that predate
    schema recording."""
    sch = man.get("schema")
    if sch:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(json.loads(sch)))
    return spark.read.option("mergeSchema", "true").parquet(path).limit(0)


def read_deletion_vectors(
    spark: SparkSession, path: str, man: dict
) -> DataFrame | None:
    """The manifest version's merged deletion vector: one
    (manifest-relative data-file path, row position) row per superseded
    data row.
    None when the version carries no delete files."""
    dv_names = man.get("delete_files") or []
    if not dv_names:
        return None
    base = path.rstrip("/") + "/" + DELETES_DIR
    return spark.read.parquet(
        *[posixpath.join(base, f) for f in dv_names]
    ).select(DV_FILE_COL, DV_POS_COL).distinct()


def read_table_with_positions(spark: SparkSession, path: str) -> DataFrame:
    """Live rows plus their physical address: ``_dv_file`` (data-file
    basename) and ``_dv_pos`` (row ordinal in that file). The address
    columns are what a merge-on-read writer turns into new deletion
    vectors; regular readers use ``read_table`` which drops them."""
    man = read_manifest(spark, path)
    if man is None:
        raise ValueError(f"{path} has no manifest; positions need committed files")
    part_keys = man.get("partition_keys") or []
    base = path.rstrip("/")
    files = [posixpath.join(base, f) for f in man["files"]]
    if not files:
        # mirror read_table's empty fallback (plus the address columns)
        # instead of returning None against the -> DataFrame contract;
        # _tag_positions needs _metadata, absent on a local empty frame,
        # so the address columns are typed NULL literals here
        empty = _empty_frame(spark, path, man)
        return empty.withColumn(
            DV_FILE_COL, F.lit(None).cast("string")
        ).withColumn(DV_POS_COL, F.lit(None).cast("long"))
    reader = spark.read.option("mergeSchema", "true")
    if part_keys:
        reader = reader.option("basePath", base)
    df = reader.parquet(*files)
    tagged = _tag_positions(df, len(part_keys))
    dv = read_deletion_vectors(spark, path, man)
    if dv is not None:
        from ..operators import cdc as _cdc

        dv = _cdc._maybe_broadcast(dv, _cdc.BROADCAST_KEYS_MAX_BYTES)
        tagged = tagged.join(dv, [DV_FILE_COL, DV_POS_COL], "left_anti")
    return tagged


def _tag_positions(df: DataFrame, levels: int = 0) -> DataFrame:
    """Address rows as (manifest-relative file path, row ordinal).

    ``levels`` = number of partition directory levels: the address is
    the last ``levels + 1`` path segments, which is exactly the
    manifest's partition-relative file entry — and plain basename for
    unpartitioned tables (levels=0), so pre-existing DVs keep matching.
    """
    n = levels + 1
    parts = F.split(F.col("_metadata.file_path"), "/")
    return df.withColumn(
        DV_FILE_COL, F.concat_ws("/", F.slice(parts, -n, n))
    ).withColumn(DV_POS_COL, F.col("_metadata.row_index"))


def delete_where(
    spark: SparkSession, path: str, predicate: tuple[str, str, object]
) -> int:
    """Merge-on-read delete: stage a position-delete file, commit it.

    The Iceberg-v2 position-delete shape, minimal form: rows matching
    ``predicate`` = (col, op, value) are addressed by (data-file
    basename, row ordinal) — no data file is rewritten. ``read_table``
    anti-joins the committed delete files on every read; a later
    compaction or COW merge of the referenced data files materializes
    the deletes and the carry-forward pruning in ``commit_manifest``
    retires the delete file. Returns the new manifest version (or the
    current one unchanged when nothing matched).

    Cost model at scale: one column-pruned scan to find matches (file
    skipping applies via the manifest stats), a delete-file write
    bounded by matched-row count, zero data-file rewrites — the cheap
    path for low-selectivity deletes that copy-on-write would amplify
    into full-file rewrites.
    """
    man = read_manifest(spark, path)
    if man is None:
        raise ValueError(f"{path} has no manifest; merge-on-read needs commits")
    matches = _apply_predicate(read_table_with_positions(spark, path), predicate)
    added, targets = stage_deletion_vectors(spark, path, matches)
    if not added:
        return man["version"]
    carried = man.get("delete_files") or []
    return commit_manifest(
        spark,
        path,
        man["files"],
        stats=man.get("stats"),
        delete_files=carried + added,
        dv_targets=targets,
    )


def stage_deletion_vectors(
    spark: SparkSession, path: str, addressed: DataFrame
) -> tuple[list[str], dict[str, list[str]]]:
    """Write ``addressed`` rows' (data-file basename, row position) as
    new position-delete files under ``_deletes/`` and return (new DV
    basenames, DV→referenced-data-file targets map). Staging only — the
    caller commits.

    One evaluation of ``addressed`` total: the frame is persisted, the
    referenced data files collect from the cache (bounded by live file
    count), and the write coalesces to a file count sized by matched
    rows — a micro-batch CDC merge stages ONE small DV file instead of
    one per shuffle partition (which tripled the per-batch wall at
    bench scale). A zero-match frame stages nothing."""
    dv_dir = path.rstrip("/") + "/" + DELETES_DIR
    addressed = addressed.select(DV_FILE_COL, DV_POS_COL).persist()
    try:
        n = addressed.count()
        if n == 0:
            return [], {}
        target_files = sorted(
            r[0] for r in addressed.select(DV_FILE_COL).distinct().collect()
        )
        before = set(list_delete_files(spark, path))
        # ~10M addresses (~100 MB) per DV part; micro-batches get 1 file
        addressed.coalesce(max(1, min(64, n // 10_000_000 + 1))).write.mode(
            "append"
        ).parquet(dv_dir)
        added = [f for f in list_delete_files(spark, path) if f not in before]
        return added, {f: target_files for f in added}
    finally:
        addressed.unpersist()


def apply_deletion_vectors(df: DataFrame, dv: DataFrame, levels: int = 0) -> DataFrame:
    """Merge-on-read: drop rows whose (file, position) is deleted.

    ``_metadata.row_index`` is the row's ordinal within its parquet
    file — stable for immutable data files, which is what makes
    positional deletes exact (Iceberg v2's position-delete design).
    The DV side is NORMALLY bounded by rows changed since the last
    materialization — small next to the table — so it broadcasts and
    the anti-join is map-side. The broadcast is size-guarded
    (cdc._maybe_broadcast): a long run of low-selectivity delete_where
    calls before any compaction can accumulate a DV set too big for
    the driver, and that case degrades to a shuffled anti-join.
    """
    from ..operators import cdc as _cdc

    dv = _cdc._maybe_broadcast(dv, _cdc.BROADCAST_KEYS_MAX_BYTES)
    return _tag_positions(df, levels).join(
        dv, [DV_FILE_COL, DV_POS_COL], "left_anti"
    ).drop(DV_FILE_COL, DV_POS_COL)


_OPS = {
    "=": lambda c, v: c == v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def _apply_predicate(df: DataFrame, predicate) -> DataFrame:
    if predicate is None:
        return df
    col, op, value = predicate
    return df.where(_OPS[op](F.col(col), F.lit(value)))


def vacuum(
    spark: SparkSession,
    path: str,
    retain_versions: int = 1,
    grace_seconds: int = 600,
) -> list[str]:
    """Delete data files not referenced by the newest ``retain_versions``
    commits, plus the expired history entries (orphans of interrupted
    writes are unlisted everywhere, so they always go). Returns the
    data-file basenames removed.

    ``grace_seconds`` (Delta/Iceberg-style retention threshold): files
    YOUNGER than this are never deleted even when unlisted — they may
    be the staged output of an in-flight merge that has appended its
    parquet but not yet committed its manifest; deleting them would
    corrupt that commit. ``0`` disables the guard (tests / known-idle
    tables)."""
    import time as _time
    man = read_manifest(spark, path)
    if man is None:
        return []
    versions = list_versions(spark, path)
    keep = set(versions[-max(retain_versions, 1):]) | {man["version"]}
    live: set[str] = set(man["files"])
    live_dv: set[str] = set(man.get("delete_files") or [])
    jvm, fs = _fs(spark, path)
    for v in sorted(keep):
        try:
            doc = _read_json_file(spark, _history_path(path, v))
            live |= set(doc["files"])
            live_dv |= set(doc.get("delete_files") or [])
        except Exception:
            pass  # history entry may predate retention or be gone
    removed = []
    now_ms = int(_time.time() * 1000)

    def _old_enough(p) -> bool:
        if grace_seconds <= 0:
            return True
        return now_ms - fs.getFileStatus(p).getModificationTime() >= grace_seconds * 1000

    emptied_dirs: set[str] = set()
    for name in list_data_files(spark, path, recursive=True):
        if name not in live:
            target = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + name)
            if _old_enough(target):
                fs.delete(target, False)
                removed.append(name)
                if "/" in name:
                    emptied_dirs.add(name.rsplit("/", 1)[0])
    collapse_empty_dirs(jvm, fs, path.rstrip("/"), emptied_dirs)
    dv_base = path.rstrip("/") + "/" + DELETES_DIR
    for name in list_delete_files(spark, path):
        if name not in live_dv:
            target = jvm.org.apache.hadoop.fs.Path(dv_base + "/" + name)
            if _old_enough(target):
                fs.delete(target, False)
                removed.append(DELETES_DIR + "/" + name)
    for v in versions:
        if v not in keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(_history_path(path, v)), False)
    return removed


def schema_drift_report(
    spark: SparkSession,
    path: str,
    from_version: int | None = None,
    to_version: int | None = None,
) -> "DataFrame":
    """Schema drift between two committed lake versions (#180).

    The audit a CDC pipeline runs when a merge starts failing schema
    alignment: every committed version's manifest carries the table
    schema (``schema_json`` rides the commit), so the drift between any
    two retained versions is a pure metadata diff — no data files are
    read. Per changed column: added / dropped / type_changed, the two
    type strings, and whether the change sits on the engine's lossless
    widening ladder (operators/cdc._WIDENING_LADDERS — the changes the
    merge path can absorb with ``allow_widening=True``; anything else
    needs a backfill).

    Defaults compare the PREVIOUS retained version against the latest —
    "what just changed" — and raise on unknown versions rather than
    silently diffing the wrong pair. Output is a bounded
    |changed columns|-row frame.
    """
    from pyspark.sql.types import StructType

    from ..operators.cdc import _widened

    versions = list_versions(spark, path)
    if not versions:
        raise ValueError(f"no retained manifest versions under {path}")
    to_v = versions[-1] if to_version is None else to_version
    if from_version is None:
        before = [v for v in versions if v < to_v]
        if not before:
            raise ValueError(
                f"version {to_v} has no retained predecessor to diff against"
            )
        from_v = before[-1]
    else:
        from_v = from_version
    for v in (from_v, to_v):
        if v not in versions:
            raise ValueError(f"version {v} not retained under {path}: {versions}")

    def fields(version: int) -> dict:
        doc = _read_json_file(spark, _history_path(path, version))
        sj = doc.get("schema")
        if not sj:
            raise ValueError(f"version {version} committed without schema_json")
        return {
            f.name: f.dataType.simpleString()
            for f in StructType.fromJson(json.loads(sj)).fields
        }

    old, new = fields(from_v), fields(to_v)
    rows = []
    for col in sorted(set(old) | set(new)):
        a, b = old.get(col), new.get(col)
        if a == b:
            continue
        if a is None:
            rows.append((col, "added", None, b, False))
        elif b is None:
            rows.append((col, "dropped", a, None, False))
        else:
            rows.append((col, "type_changed", a, b, _widened(a, b) == b))
    return spark.createDataFrame(
        rows,
        "column string, change string, from_type string, to_type string,"
        " lossless_widening boolean",
    )
