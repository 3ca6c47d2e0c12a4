"""Manifest-gated atomic commits (sources/manifest.py): the reader must
see exactly one table version at every point of the stage → commit →
delete sequence, including simulated crashes inside the window the
reference leaves open (DMSCDC_LoadIncremental.py:68-87)."""

import pytest
from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer, manifest


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, _seq long, id long, name string"
    )


def _init(spark, path, n=3):
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(n)], "id long, name string"
    ).repartition(3)
    lake_writer.write_initial(df, path, use_manifest=True)
    return df


def test_manifest_read_matches_directory_read(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out)
    lake_writer.merge_incremental(
        spark, _changes(spark, [("U", 1, 1, "n1b"), ("I", 1, 9, "n9")]),
        out, ["id"], use_manifest=True,
    )
    via_manifest = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    via_dir = {(r.id, r.name) for r in spark.read.parquet(out).collect()}
    assert via_manifest == via_dir == {(0, "n0"), (1, "n1b"), (2, "n2"), (9, "n9")}


def test_crash_before_commit_keeps_old_version(spark, tmp_path, monkeypatch):
    out = str(tmp_path / "t")
    _init(spark, out)
    before = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}

    # crash AFTER the append but BEFORE the manifest commit
    def boom(*a, **k):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(manifest, "commit_manifest", boom)
    with pytest.raises(RuntimeError):
        lake_writer.merge_incremental(
            spark, _changes(spark, [("U", 1, 1, "n1b")]), out, ["id"],
            use_manifest=True,
        )
    monkeypatch.undo()
    # manifest reader: unchanged old version, no duplicates; the
    # directory reader WOULD see both copies of id=1 here
    after = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    assert after == before
    dir_rows = spark.read.parquet(out).collect()
    assert len(dir_rows) > len(after)  # orphans exist on disk
    assert manifest.vacuum(spark, out, grace_seconds=0)  # ...and vacuum reclaims them
    assert {(r.id, r.name) for r in spark.read.parquet(out).collect()} == before


def test_crash_after_commit_shows_new_version(spark, tmp_path, monkeypatch):
    out = str(tmp_path / "t")
    _init(spark, out)

    # crash AFTER the manifest commit but BEFORE the superseded-file
    # deletes: new version visible, old copies invisible to the reader
    jvm_delete = {}

    def fake_merge(spark_, changes, path, pks, **kw):
        raise AssertionError("unused")

    real_commit = manifest.commit_manifest

    def commit_then_crash(spark_, path, files, **kw):
        real_commit(spark_, path, files, **kw)
        raise RuntimeError("crash after commit")

    monkeypatch.setattr(manifest, "commit_manifest", commit_then_crash)
    with pytest.raises(RuntimeError):
        lake_writer.merge_incremental(
            spark, _changes(spark, [("U", 1, 1, "n1b"), ("D", 2, 0, None)]),
            out, ["id"], use_manifest=True,
        )
    monkeypatch.undo()
    got = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    assert got == {(1, "n1b"), (2, "n2")}
    # superseded originals are still on disk (delete never ran)...
    assert len(spark.read.parquet(out).collect()) > len(got)
    # ...and a follow-up merge against the manifest still works
    lake_writer.merge_incremental(
        spark, _changes(spark, [("I", 1, 7, "n7")]), out, ["id"],
        use_manifest=True,
    )
    got2 = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    assert got2 == {(1, "n1b"), (2, "n2"), (7, "n7")}


def test_manifest_versions_increase(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out)
    v1 = manifest.read_manifest(spark, out)["version"]
    lake_writer.merge_incremental(
        spark, _changes(spark, [("I", 1, 5, "n5")]), out, ["id"],
        use_manifest=True,
    )
    v2 = manifest.read_manifest(spark, out)["version"]
    assert v2 == v1 + 1


def _pchanges(spark, rows):
    return spark.createDataFrame(
        rows, "op string, _seq long, id long, dept string, v long"
    )


def _pinit(spark, path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "id long, dept string, v long",
    )
    lake_writer.write_initial(
        df, path, partition_keys=["dept"], use_manifest=True, stats_cols=["v"]
    )
    return df


def test_partitioned_manifest_end_to_end(spark, tmp_path):
    """The flagship table shape: partitioned + manifest. One merge
    commits atomically across partitions; time travel spans it;
    partition-value pruning and data-column stats pruning both hold."""
    out = str(tmp_path / "t")
    _pinit(spark, out)  # v1
    man = manifest.read_manifest(spark, out)
    assert man["partition_keys"] == ["dept"]
    assert all("/" in f and f.startswith("dept=") for f in man["files"])

    # update in a, delete in b, move id=2 a->b: touches BOTH partitions
    lake_writer.merge_incremental(
        spark,
        _pchanges(spark, [
            ("U", 1, 1, "a", 11), ("D", 1, 3, "b", None), ("U", 1, 2, "b", 21),
        ]),
        out, ["id"], partition_keys=["dept"],
        use_manifest=True, retain_history=True, stats_cols=["v"],
    )  # v2
    got = {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()}
    assert got == {(1, "a", 11), (2, "b", 21), (4, "b", 40)}
    # time travel across the partitioned merge
    v1 = {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out, version=1).collect()}
    assert v1 == {(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)}

    # partition-value pruning: only dept=b files are opened
    df_b = manifest.read_table(spark, out, predicate=("dept", "=", "b"))
    assert all("dept=b" in f for f in df_b.inputFiles())
    assert {(r.id, r.v) for r in df_b.collect()} == {(2, 21), (4, 40)}
    # data-column stats pruning still applies within partitions
    df_v = manifest.read_table(spark, out, predicate=("v", ">", 30))
    assert {(r.id, r.v) for r in df_v.collect()} == {(4, 40)}
    assert len(df_v.inputFiles()) < len(manifest.read_manifest(spark, out)["files"])


def test_partitioned_crash_before_commit_keeps_old_version(
    spark, tmp_path, monkeypatch
):
    out = str(tmp_path / "t")
    _pinit(spark, out)
    before = {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()}

    def boom(*a, **k):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(manifest, "commit_manifest", boom)
    with pytest.raises(RuntimeError):
        lake_writer.merge_incremental(
            spark, _pchanges(spark, [("U", 1, 1, "a", 99)]), out, ["id"],
            partition_keys=["dept"], use_manifest=True,
        )
    monkeypatch.undo()
    # manifest readers: unchanged old version; orphans on disk; vacuum reclaims
    assert {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()} == before
    assert len(spark.read.parquet(out).collect()) > len(before)
    assert manifest.vacuum(spark, out, grace_seconds=0)
    assert {(r.id, r.dept, r.v) for r in spark.read.parquet(out).collect()} == before


def test_partitioned_crash_after_commit_shows_new_version(
    spark, tmp_path, monkeypatch
):
    out = str(tmp_path / "t")
    _pinit(spark, out)
    real_commit = manifest.commit_manifest

    def commit_then_crash(spark_, path, files, **kw):
        real_commit(spark_, path, files, **kw)
        raise RuntimeError("crash after commit")

    monkeypatch.setattr(manifest, "commit_manifest", commit_then_crash)
    with pytest.raises(RuntimeError):
        lake_writer.merge_incremental(
            spark, _pchanges(spark, [("U", 1, 1, "a", 99)]), out, ["id"],
            partition_keys=["dept"], use_manifest=True,
        )
    monkeypatch.undo()
    got = {(r.id, r.v) for r in manifest.read_table(spark, out).collect()}
    assert got == {(1, 99), (2, 20), (3, 30), (4, 40)}
    # superseded dept=a originals still on disk, invisible to the reader
    assert len(spark.read.parquet(out).collect()) > len(got)
    # follow-up merge against the committed manifest still works
    lake_writer.merge_incremental(
        spark, _pchanges(spark, [("I", 1, 5, "c", 50)]), out, ["id"],
        partition_keys=["dept"], use_manifest=True,
    )
    got2 = {(r.id, r.v) for r in manifest.read_table(spark, out).collect()}
    assert got2 == {(1, 99), (2, 20), (3, 30), (4, 40), (5, 50)}


def test_partitioned_merge_drops_emptied_partition(spark, tmp_path):
    out = str(tmp_path / "t")
    _pinit(spark, out)
    lake_writer.merge_incremental(
        spark,
        _pchanges(spark, [("D", 1, 1, "a", None), ("D", 1, 2, "a", None)]),
        out, ["id"], partition_keys=["dept"], use_manifest=True,
    )
    got = {(r.id, r.dept) for r in manifest.read_table(spark, out).collect()}
    assert got == {(3, "b"), (4, "b")}
    assert not any(
        f.startswith("dept=a/")
        for f in manifest.read_manifest(spark, out)["files"]
    )
    import os

    assert not os.path.isdir(f"{out}/dept=a")


@pytest.mark.slow
def test_partitioned_compact_through_manifest(spark, tmp_path):
    out = str(tmp_path / "t")
    _pinit(spark, out)
    for i in range(3):  # accrete small files
        lake_writer.merge_incremental(
            spark, _pchanges(spark, [("I", 1, 10 + i, "a", 100 + i)]),
            out, ["id"], partition_keys=["dept"], use_manifest=True,
        )
    before = {(r.id, r.v) for r in manifest.read_table(spark, out).collect()}
    n_before = len(manifest.read_manifest(spark, out)["files"])
    lake_writer.compact_table(
        spark, out, partition_keys=["dept"], use_manifest=True, stats_cols=["v"]
    )
    after = {(r.id, r.v) for r in manifest.read_table(spark, out).collect()}
    assert after == before
    man = manifest.read_manifest(spark, out)
    assert len(man["files"]) < n_before
    assert man["partition_keys"] == ["dept"]


def test_partitioned_delete_where_hides_rows(spark, tmp_path):
    """MOR position deletes on the flagship PARTITIONED shape: DVs
    address files by partition-relative path, no data file rewrites,
    partition columns survive the DV anti-join read."""
    out = str(tmp_path / "t")
    _pinit(spark, out)
    files_before = manifest.read_manifest(spark, out)["files"]
    manifest.delete_where(spark, out, ("v", ">", 25))
    man = manifest.read_manifest(spark, out)
    assert man["files"] == files_before and man.get("delete_files")
    got = {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()}
    assert got == {(1, "a", 10), (2, "a", 20)}


def _pchanges(spark, rows):
    return spark.createDataFrame(
        rows, "op string, _seq long, id long, dept string, v long"
    )


def test_partitioned_merge_on_read_incremental(spark, tmp_path):
    out = str(tmp_path / "t")
    _pinit(spark, out)
    files_before = manifest.read_manifest(spark, out)["files"]
    lake_writer.merge_on_read_incremental(
        spark,
        _pchanges(
            spark,
            [
                ("U", 1, 2, "a", 21),    # update in partition a
                ("D", 1, 3, "b", 0),     # delete in partition b
                ("I", 1, 5, "c", 50),    # insert into a NEW partition
            ],
        ),
        out,
        ["id"],
    )
    man = manifest.read_manifest(spark, out)
    # old files untouched (DV + append, never a rewrite)
    assert set(files_before) <= set(man["files"]) and man.get("delete_files")
    assert any(f.startswith("dept=c/") for f in man["files"])
    got = {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()}
    assert got == {(1, "a", 10), (2, "a", 21), (4, "b", 40), (5, "c", 50)}
    # replay is idempotent: the retry supersedes its first copy
    lake_writer.merge_on_read_incremental(
        spark, _pchanges(spark, [("U", 1, 2, "a", 21)]), out, ["id"]
    )
    assert {
        (r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()
    } == got


def test_partitioned_mor_compaction_materializes_dvs(spark, tmp_path):
    out = str(tmp_path / "t")
    _pinit(spark, out)
    lake_writer.merge_on_read_incremental(
        spark, _pchanges(spark, [("D", 1, 1, "a", 0), ("U", 1, 4, "b", 41)]),
        out, ["id"],
    )
    before = {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()}
    lake_writer.compact_table(
        spark, out, partition_keys=["dept"], use_manifest=True, stats_cols=["v"]
    )
    man = manifest.read_manifest(spark, out)
    assert not man.get("delete_files")  # DVs materialized + retired
    after = {(r.id, r.dept, r.v) for r in manifest.read_table(spark, out).collect()}
    assert after == before == {(2, "a", 20), (3, "b", 30), (4, "b", 41)}


def test_time_travel_reads_old_versions(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out)  # v1
    lake_writer.merge_incremental(
        spark, _changes(spark, [("U", 1, 1, "n1b"), ("D", 2, 0, None)]),
        out, ["id"], use_manifest=True, retain_history=True,
    )  # v2
    lake_writer.merge_incremental(
        spark, _changes(spark, [("I", 1, 9, "n9")]),
        out, ["id"], use_manifest=True, retain_history=True,
    )  # v3
    assert manifest.list_versions(spark, out) == [1, 2, 3]

    v1 = {(r.id, r.name) for r in manifest.read_table(spark, out, version=1).collect()}
    v2 = {(r.id, r.name) for r in manifest.read_table(spark, out, version=2).collect()}
    v3 = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    assert v1 == {(0, "n0"), (1, "n1"), (2, "n2")}
    assert v2 == {(1, "n1b"), (2, "n2")}
    assert v3 == {(1, "n1b"), (2, "n2"), (9, "n9")}


def test_vacuum_retention_expires_old_versions(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out)  # v1
    lake_writer.merge_incremental(
        spark, _changes(spark, [("U", 1, 1, "n1b")]),
        out, ["id"], use_manifest=True, retain_history=True,
    )  # v2
    removed = manifest.vacuum(spark, out, retain_versions=1, grace_seconds=0)
    assert removed  # v1-only files reclaimed
    assert manifest.list_versions(spark, out) == [2]
    # latest still intact
    got = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    assert got == {(0, "n0"), (1, "n1b"), (2, "n2")}
    # expired version no longer readable
    with pytest.raises(Exception):
        manifest.read_table(spark, out, version=1).collect()


# ---------------------------------------------------------- file skipping

def _init_ranged(spark, path):
    """Three files with disjoint id ranges: [0..9], [100..109], [200..209]."""
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(lo + i, f"n{lo + i}") for i in range(10)], "id long, name string"
        ).coalesce(1)
        lake_writer.merge_incremental(
            spark, df.select(F.lit("I").alias("op"), F.lit(1).alias("_seq"), "id", "name"),
            path, [], use_manifest=True, stats_cols=["id"],
        )


@pytest.mark.slow
def test_stats_recorded_per_file(spark, tmp_path):
    out = str(tmp_path / "t")
    _init_ranged(spark, out)
    man = manifest.read_manifest(spark, out)
    assert len(man["files"]) == 3
    stats = man["stats"]
    ranges = sorted((s["id"]["min"], s["id"]["max"]) for s in stats.values())
    assert ranges == [(0, 9), (100, 109), (200, 209)]


@pytest.mark.slow
def test_predicate_prunes_files_and_matches_full_scan(spark, tmp_path):
    out = str(tmp_path / "t")
    _init_ranged(spark, out)
    pruned = manifest.read_table(spark, out, predicate=("id", ">=", 200))
    assert len(pruned.inputFiles()) == 1  # two files provably excluded
    expect = {(r.id, r.name) for r in
              manifest.read_table(spark, out).where(F.col("id") >= 200).collect()}
    assert {(r.id, r.name) for r in pruned.collect()} == expect

    eq = manifest.read_table(spark, out, predicate=("id", "=", 105))
    assert len(eq.inputFiles()) == 1
    assert [r.id for r in eq.collect()] == [105]

    # predicate excluded by every file's range -> zero files, empty result
    none = manifest.read_table(spark, out, predicate=("id", ">", 500))
    assert none.count() == 0


def test_predicate_without_stats_reads_everything(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out)  # committed without stats_cols
    df = manifest.read_table(spark, out, predicate=("id", "=", 1))
    assert len(df.inputFiles()) == 3  # no stats -> no pruning, still correct
    assert [r.id for r in df.collect()] == [1]


@pytest.mark.slow
def test_stats_survive_cow_merge(spark, tmp_path):
    out = str(tmp_path / "t")
    _init_ranged(spark, out)
    # update one key in the middle file; other files' stats must carry over
    lake_writer.merge_incremental(
        spark, _changes(spark, [("U", 2, 105, "upd")]), out, ["id"],
        use_manifest=True, stats_cols=["id"],
    )
    man = manifest.read_manifest(spark, out)
    assert set(man["files"]) == set(man["stats"])  # every live file has stats
    pruned = manifest.read_table(spark, out, predicate=("id", ">=", 200))
    assert len(pruned.inputFiles()) == 1
    upd = manifest.read_table(spark, out, predicate=("id", "=", 105))
    assert {(r.id, r.name) for r in upd.collect()} == {(105, "upd")}
    # the rewrite may split the impacted file; pruning must still drop
    # every file whose range excludes 105 (the [0..9] and [200..209] ones)
    assert len(upd.inputFiles()) < len(man["files"])


# ------------------------------------------------------- clustered compaction

@pytest.mark.slow
def test_compact_through_manifest_clusters_and_skips(spark, tmp_path):
    out = str(tmp_path / "t")
    # interleaved ids across commits -> every file spans the full range,
    # so pre-compaction stats prune nothing
    for start in (0, 1, 2):
        df = spark.createDataFrame(
            [(start + 3 * i, f"n{start + 3 * i}") for i in range(100)],
            "id long, name string",
        ).coalesce(1)
        lake_writer.merge_incremental(
            spark,
            df.select(F.lit("I").alias("op"), F.lit(1).alias("_seq"), "id", "name"),
            out, [], use_manifest=True, stats_cols=["id"],
        )
    scrambled = manifest.read_table(spark, out, predicate=("id", "<", 10))
    assert len(scrambled.inputFiles()) == 3  # no skipping possible yet

    lake_writer.compact_table(
        spark, out, target_file_bytes=2048, cluster_by=["id"],
        use_manifest=True, stats_cols=["id"],
    )
    man = manifest.read_manifest(spark, out)
    assert len(man["files"]) > 1  # genuinely multi-file after compaction
    assert set(man["files"]) == set(man["stats"])
    # data intact
    rows = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    assert rows == {(i, f"n{i}") for i in range(300)}
    # range clustering -> disjoint per-file ranges -> selective read
    # touches a strict subset of files
    pruned = manifest.read_table(spark, out, predicate=("id", "<", 10))
    assert 0 < len(pruned.inputFiles()) < len(man["files"])
    assert {r.id for r in pruned.collect()} == set(range(10))
    # superseded files physically gone (retain_history=False default)
    assert set(manifest.list_data_files(spark, out)) == set(man["files"])


@pytest.mark.slow
def test_compact_manifest_retain_history_time_travels(spark, tmp_path):
    out = str(tmp_path / "t")
    _init_ranged(spark, out)
    v_before = manifest.read_manifest(spark, out)["version"]
    lake_writer.compact_table(
        spark, out, target_file_bytes=1 << 30, cluster_by=["id"],
        use_manifest=True, stats_cols=["id"], retain_history=True,
    )
    # old version still readable (files retained), new version compacted
    old = manifest.read_table(spark, out, version=v_before)
    assert old.count() == 30
    assert manifest.read_table(spark, out).count() == 30


# ----------------------------------------------- merge-on-read deletes


def test_delete_where_hides_rows_without_rewrites(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out, n=6)
    files_before = manifest.read_manifest(spark, out)["files"]
    v = manifest.delete_where(spark, out, ("id", ">=", 4))
    man = manifest.read_manifest(spark, out)
    assert man["version"] == v
    assert man["files"] == files_before  # no data file rewritten
    assert man.get("delete_files")
    got = {r.id for r in manifest.read_table(spark, out).collect()}
    assert got == {0, 1, 2, 3}


def test_delete_where_no_matches_keeps_version(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out, n=3)
    v0 = manifest.read_manifest(spark, out)["version"]
    assert manifest.delete_where(spark, out, ("id", ">", 99)) == v0
    assert not manifest.read_manifest(spark, out).get("delete_files")


def test_append_after_delete_carries_delete_files_forward(spark, tmp_path):
    """ADVICE(high): the first commit after a DV-bearing one must not
    silently resurrect positionally-deleted rows."""
    out = str(tmp_path / "t")
    _init(spark, out, n=4)
    manifest.delete_where(spark, out, ("id", "=", 2))
    # insert-only append commit (does not pass delete_files)
    lake_writer.merge_incremental(
        spark, _changes(spark, [("I", 1, 10, "n10")]), out, ["id"],
        use_manifest=True,
    )
    man = manifest.read_manifest(spark, out)
    assert man.get("delete_files"), "delete files dropped by append commit"
    got = {r.id for r in manifest.read_table(spark, out).collect()}
    assert got == {0, 1, 3, 10}


def test_cow_merge_after_delete_does_not_resurrect(spark, tmp_path):
    """ADVICE(medium): the COW impacted-file re-read must apply DVs."""
    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(6)], "id long, name string"
    ).coalesce(1)  # ONE data file: the merge rewrite hits the DV'd file
    lake_writer.write_initial(df, out, use_manifest=True)
    manifest.delete_where(spark, out, ("id", "=", 5))
    lake_writer.merge_incremental(
        spark, _changes(spark, [("U", 1, 0, "n0b")]), out, ["id"],
        use_manifest=True,
    )
    got = {(r.id, r.name) for r in manifest.read_table(spark, out).collect()}
    assert got == {(0, "n0b"), (1, "n1"), (2, "n2"), (3, "n3"), (4, "n4")}
    # the rewrite materialized the delete; carry-forward pruned the DV
    assert not manifest.read_manifest(spark, out).get("delete_files")


def test_compaction_materializes_deletes_and_prunes_dvs(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out, n=8)
    manifest.delete_where(spark, out, ("id", "<", 2))
    lake_writer.compact_table(spark, out, use_manifest=True)
    man = manifest.read_manifest(spark, out)
    assert not man.get("delete_files")
    got = {r.id for r in manifest.read_table(spark, out).collect()}
    assert got == set(range(2, 8))


def test_read_table_with_positions_empty_manifest(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out, n=2)
    # commit an empty live set (all files rewritten away elsewhere)
    manifest.commit_manifest(spark, out, [], delete_files=[])
    df = manifest.read_table_with_positions(spark, out)
    assert df is not None
    assert manifest.DV_FILE_COL in df.columns
    assert manifest.DV_POS_COL in df.columns
    assert df.count() == 0


def test_delete_where_twice_accumulates(spark, tmp_path):
    out = str(tmp_path / "t")
    _init(spark, out, n=6)
    manifest.delete_where(spark, out, ("id", "=", 0))
    manifest.delete_where(spark, out, ("id", "=", 5))
    got = {r.id for r in manifest.read_table(spark, out).collect()}
    assert got == {1, 2, 3, 4}
    assert len(manifest.read_manifest(spark, out)["delete_files"]) >= 2


def test_register_manifest_view_serves_committed_snapshot(spark, tmp_path):
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import catalog

    out = str(tmp_path / "t")
    _init(spark, out, n=5)
    manifest.delete_where(spark, out, ("id", "=", 4))
    catalog.register_manifest_view(spark, out, "sampledb__t")
    got = {r.id for r in spark.sql("SELECT id FROM sampledb__t").collect()}
    assert got == {0, 1, 2, 3}  # DV applied, orphans invisible


def test_zorder_compaction_skips_on_both_columns(spark, tmp_path):
    """Z-order compaction must make manifest min/max skipping effective
    for predicates on EITHER clustered column; lexicographic range
    clustering only serves the first. Same rows, fewer files opened."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "zt")
    # two independent uniform dimensions, scrambled row order
    rows = [(i, (i * 7919) % 1000, (i * 104729) % 1000) for i in range(4000)]
    df = spark.createDataFrame(rows, "rid long, x long, y long").repartition(8)
    df.write.parquet(out)
    files = manifest.list_data_files(spark, out)
    manifest.commit_manifest(
        spark, out, files,
        stats=manifest.compute_file_stats(spark, out, files, ["x", "y"]),
    )

    n_files = lake_writer.compact_table(
        spark, out, target_file_bytes=8 * 1024,
        cluster_by=("x", "y"), use_manifest=True, stats_cols=("x", "y"),
        zorder=True,
    )
    assert n_files >= 4  # enough output files for skipping to be visible

    total = len(manifest.read_table(spark, out).inputFiles())
    for col in ("x", "y"):
        pruned = manifest.read_table(spark, out, predicate=(col, "<", 100))
        assert len(pruned.inputFiles()) < total, f"no skipping on {col}"
        got = sorted(r.rid for r in pruned.where(f"{col} < 100").collect())
        want = sorted(r[0] for r in rows if (r[1] if col == "x" else r[2]) < 100)
        assert got == want  # pruning loses no rows

    # zorder key itself: interleaving is monotone per dimension
    zk = lake_writer.zorder_key(
        spark.createDataFrame(rows, "rid long, x long, y long"), ["x", "y"]
    )
    import pytest

    with pytest.raises(ValueError):
        lake_writer.zorder_key(df, ["x"])


def test_zorder_bit_budget_clamps_and_rejects(spark, tmp_path):
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    df = spark.createDataFrame(
        [(i, i % 7, i % 11, i % 13, i % 17, i % 19) for i in range(100)],
        "rid long, a long, b long, c long, d long, e long",
    )
    # 5 columns -> 12 bits each, still a valid key expression
    col = lake_writer.zorder_key(df, ["a", "b", "c", "d", "e"])
    assert df.select(col.alias("z")).count() == 100
    import pytest

    with pytest.raises(ValueError):  # 16 columns -> < 4 bits each
        lake_writer.zorder_key(df, ["a", "b", "c", "d", "e"] * 4)


def test_zorder_partitioned_table_file_count_bounded(spark, tmp_path):
    """zorder on a PARTITIONED table must lead the range clustering
    with the partition keys — otherwise every task writes into every
    partition and file count explodes to tasks x partitions."""
    import glob

    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import lake_writer

    out = str(tmp_path / "pz")
    rows = [((i * 7919) % 1000, (i * 104729) % 1000, f"p{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "x long, y long, dt string").repartition(8)
    df.write.partitionBy("dt").parquet(out)
    n_files = lake_writer.compact_table(
        spark, out, target_file_bytes=16 * 1024,
        partition_keys=("dt",), cluster_by=("x", "y"), zorder=True,
    )
    written = glob.glob(f"{out}/dt=*/*.parquet")
    # each task covers a contiguous partition run: ~n_files total files,
    # never the n_files * 4 a naive zk-only clustering would emit
    assert len(written) <= n_files + 4
    assert spark.read.parquet(out).count() == 4000


def test_temporal_prune_date_probe_against_timestamp_stats(spark, tmp_path):
    """A DATE probe against TIMESTAMP stats (and vice versa) must not
    lexically mis-prune — date bounds/probes compare as midnight, the
    same promotion Spark applies to the real filter."""
    import datetime as dt

    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 8, 14, 0, 0)), (2, dt.datetime(2026, 8, 14, 12, 0))],
        "id long, ts timestamp",
    ).coalesce(1)
    lake_writer.merge_incremental(
        spark, df.select(F.lit("I").alias("op"), F.lit(1).alias("_seq"), "id", "ts"),
        out, [], use_manifest=True, stats_cols=["ts"],
    )
    # probe with a DATE equal to the file's min day: must keep the file
    kept = manifest.read_table(spark, out, predicate=("ts", "=", dt.date(2026, 8, 14)))
    assert len(kept.inputFiles()) == 1
    # >= the day after: provably excluded
    gone = manifest.read_table(spark, out, predicate=("ts", ">=", dt.date(2026, 8, 15)))
    assert len(gone.inputFiles()) == 0


def test_committed_empty_table_still_readable(spark, tmp_path):
    """A committed-empty version (files=[]) with every data file
    vacuumed must still read as an empty frame in the RECORDED schema —
    raw-directory schema inference has nothing left to infer from."""
    out = str(tmp_path / "t")
    _init(spark, out)  # records schema_json in the manifest
    manifest.commit_manifest(spark, out, [])  # schema carries forward
    manifest.vacuum(spark, out, grace_seconds=0)  # all data files gone
    assert manifest.read_manifest(spark, out)["files"] == []
    empty = manifest.read_table(spark, out)
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "name"}


def test_vacuum_grace_period_spares_fresh_orphans(spark, tmp_path):
    """An unlisted file younger than the grace window must survive — it
    may be an in-flight merge's staged output."""
    out = str(tmp_path / "t")
    _init(spark, out)
    # stage an orphan (simulates append-before-commit of a live merge)
    spark.createDataFrame([(99, "x")], "id long, name string").coalesce(1) \
        .write.mode("append").parquet(out)
    orphans_before = set(manifest.list_data_files(spark, out)) - set(
        manifest.read_manifest(spark, out)["files"]
    )
    assert orphans_before
    assert manifest.vacuum(spark, out, grace_seconds=3600) == []
    assert manifest.vacuum(spark, out, grace_seconds=0)  # explicit opt-out reclaims


def test_register_manifest_view_partitioned(spark, tmp_path):
    """The committed-snapshot view works for partitioned manifests too
    (partition columns present, only live files served)."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.sources import catalog

    out = str(tmp_path / "t")
    _pinit(spark, out)
    lake_writer.merge_incremental(
        spark, _pchanges(spark, [("U", 1, 1, "a", 99)]), out, ["id"],
        partition_keys=["dept"], use_manifest=True, retain_history=True,
    )
    catalog.register_manifest_view(spark, out, "pt_view")
    got = {(r.id, r.dept, r.v) for r in spark.sql("SELECT * FROM pt_view").collect()}
    assert got == {(1, "a", 99), (2, "a", 20), (3, "b", 30), (4, "b", 40)}


def test_partitioned_manifest_additive_evolution(spark, tmp_path):
    """A batch carrying a NEW column merges into a partitioned manifest
    table: older committed files lack the column (typed NULLs on read),
    the manifest schema advances, and time travel still serves v1."""
    out = str(tmp_path / "t")
    _pinit(spark, out)  # v1: (id, dept, v)
    evolved = spark.createDataFrame(
        [("U", 1, 1, "a", 11, "x@y.z")],
        "op string, _seq long, id long, dept string, v long, email string",
    )
    lake_writer.merge_incremental(
        spark, evolved, out, ["id"], partition_keys=["dept"],
        use_manifest=True, retain_history=True,
    )
    got = {(r.id, r.v, r.email) for r in manifest.read_table(spark, out).collect()}
    assert got == {
        (1, 11, "x@y.z"), (2, 20, None), (3, 30, None), (4, 40, None)
    }
    assert "email" not in manifest.read_table(spark, out, version=1).columns


def test_schema_drift_report(spark, tmp_path):
    """v1 (a int, b string) -> v2 (a bigint, c double): a widened
    losslessly, b dropped, c added; defaults diff latest vs its
    predecessor; unknown versions raise."""
    out = str(tmp_path / "drift")
    df1 = spark.createDataFrame([(1, "x")], "a int, b string")
    df1.write.mode("overwrite").parquet(f"{out}/s1")
    manifest.commit_manifest(
        spark, out,
        [f"s1/{n}" for n in manifest.list_data_files(spark, f"{out}/s1")],
        schema_json=df1.schema.json(),
    )
    df2 = spark.createDataFrame([(1, 1.5)], "a bigint, c double")
    df2.write.mode("overwrite").parquet(f"{out}/s2")
    manifest.commit_manifest(
        spark, out,
        [f"s2/{n}" for n in manifest.list_data_files(spark, f"{out}/s2")],
        delete_files=[f"s1/{n}" for n in manifest.list_data_files(spark, f"{out}/s1")],
        schema_json=df2.schema.json(),
    )
    got = {
        r.column: (r.change, r.from_type, r.to_type, r.lossless_widening)
        for r in manifest.schema_drift_report(spark, out).collect()
    }
    assert got == {
        "a": ("type_changed", "int", "bigint", True),
        "b": ("dropped", "string", None, False),
        "c": ("added", None, "double", False),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not retained"):
        manifest.schema_drift_report(spark, out, from_version=7)


def test_cas_commit_stale_base_raises(spark, tmp_path):
    """expected_base_version (round-13 ADVICE): a writer working from a
    version the table has already moved past must raise, not clobber."""
    out = str(tmp_path / "cas_stale")
    _init(spark, out)  # v1
    man = manifest.read_manifest(spark, out)
    files = man["files"]
    manifest.commit_manifest(spark, out, files, expected_base_version=1)  # v2
    with pytest.raises(manifest.ConcurrentCommitError, match="advanced"):
        manifest.commit_manifest(spark, out, files, expected_base_version=1)
    assert manifest.read_manifest(spark, out)["version"] == 2


def test_cas_commit_history_create_is_the_atomic_point(spark, tmp_path):
    """Two same-base writers collide on the no-overwrite history create:
    the loser raises BEFORE the LATEST pointer moves, so the winner's
    commit survives — no check-then-commit window at all."""
    out = str(tmp_path / "cas_atomic")
    _init(spark, out)  # v1
    man = manifest.read_manifest(spark, out)
    # simulate the winner: its v2 history entry is already on disk
    # (the pre-check can't see it — LATEST still points at v1)
    jvm = spark._jvm
    hist = jvm.org.apache.hadoop.fs.Path(manifest._history_path(out, 2))
    _, fs = manifest._fs(spark, out)
    hout = fs.create(hist, False)
    hout.write(b"{}")
    hout.close()
    with pytest.raises(manifest.ConcurrentCommitError, match="commit race"):
        manifest.commit_manifest(
            spark, out, man["files"], expected_base_version=1
        )
    assert manifest.read_manifest(spark, out)["version"] == 1


def test_cas_commit_on_fresh_table_base_zero(spark, tmp_path):
    """expected_base_version=0 commits v1 on a table with no manifest."""
    out = str(tmp_path / "cas_fresh")
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    df.coalesce(1).write.parquet(out)
    files = manifest.list_data_files(spark, out)
    v = manifest.commit_manifest(
        spark, out, files, schema_json=df.schema.json(),
        expected_base_version=0,
    )
    assert v == 1
    assert manifest.read_manifest(spark, out)["version"] == 1
