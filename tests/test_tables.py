"""SnapshotTable hygiene: manifest compaction stays metadata-only and
planning stays O(current files); dynamic-partition overwrites GC correctly
and survive URL-escaped partition values."""

import glob
import os

from pyspark.sql import Row

from pyhydroqc_spark.tables import SnapshotTable


def test_manifest_hygiene_1000_commits(tmp_path):
    """1,000 commits: planning a read loads ONE self-contained manifest
    (cost O(current files), not O(commit history)); rewrite_manifests
    bounds the on-disk manifest count without touching data files."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    for i in range(1000):
        files = dict(tbl._load(tbl.current_snapshot_id())["files"])
        files[f"/data/f{i:04d}.parquet"] = f"p{i % 7}"
        tbl._commit(files)
    assert tbl.current_snapshot_id() == 1000

    # planning = exactly one manifest load, independent of history length
    loads = []
    orig = tbl._load
    tbl._load = lambda sid: (loads.append(sid), orig(sid))[1]
    fs = tbl.files()
    assert len(fs) == 1000
    assert len(loads) == 1
    tbl._load = orig

    # compaction: metadata-only, keeps the newest manifests + readability
    removed = tbl.rewrite_manifests(keep_last=2)
    assert removed == 998
    remaining = glob.glob(os.path.join(tbl.snap_dir, "v*.json"))
    assert len(remaining) == 2
    assert len(tbl.files()) == 1000  # current snapshot still fully readable
    assert len(tbl.files(999)) == 999  # keep_last window still time-travels


def test_expire_sweeps_nested_partition_layout(spark, tmp_path):
    """Data files written by overwrite_partitions live one level deeper
    (data/<uuid>/__part=*/): expire_snapshots must GC those too once
    they're replaced by a later dynamic overwrite."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    df1 = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    tbl.overwrite_partitions(df1, "k")
    old_files = set(tbl.files())
    df2 = spark.createDataFrame([Row(k="a", v=10), Row(k="b", v=20)])
    tbl.overwrite_partitions(df2, "k")
    removed = tbl.expire_snapshots(keep_last=1)
    assert old_files <= set(removed)
    for fp in old_files:
        assert not os.path.exists(fp)
    got = {(r["k"], r["v"]) for r in tbl.read(spark).collect()}
    assert got == {("a", 10), ("b", 20)}


def test_overwrite_partitions_unescapes_special_chars(spark, tmp_path):
    """Partition values with URL-escaped characters (':' -> '%3A' in the
    directory name) must round-trip raw through the manifest so
    files_for_partitions matches caller-supplied strings."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k="2024-01-01 10:00", v=1), Row(k="2024-01-02 11:30", v=2)]
    )
    tbl.overwrite_partitions(df, "k")
    assert tbl.partitions() == {"2024-01-01 10:00", "2024-01-02 11:30"}
    fs = tbl.files_for_partitions({"2024-01-01 10:00"})
    assert len(fs) >= 1
    got = {r["v"] for r in spark.read.parquet(*fs).collect()}
    assert got == {1}
