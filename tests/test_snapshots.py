"""Versioned snapshot tables (sources/snapshots.py): atomic manifest
commits, snapshot isolation, time travel, optimistic concurrency,
copy-on-write delete, vacuum."""

import os
import time

import pytest
from pyspark.sql import functions as F

from datum_spark.sources.snapshots import CommitConflict, SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable.create(spark, str(tmp_path / "snap"))


def _rows(df):
    return sorted(r["v"] for r in df.collect())


def test_append_versions_and_read(spark, table):
    assert table.current_version() == 0
    assert table.read().count() == 0
    v1 = table.append(spark.range(3).select(F.col("id").alias("v")))
    v2 = table.append(spark.range(3, 5).select(F.col("id").alias("v")))
    assert (v1, v2) == (1, 2)
    assert _rows(table.read()) == [0, 1, 2, 3, 4]


def test_time_travel_by_version_and_timestamp(spark, table):
    table.append(spark.range(2).select(F.col("id").alias("v")))
    t_mid = time.time()
    time.sleep(0.01)
    table.overwrite(spark.range(10, 12).select(F.col("id").alias("v")))
    assert _rows(table.read()) == [10, 11]
    assert _rows(table.read(version=1)) == [0, 1]
    assert _rows(table.read(as_of=t_mid)) == [0, 1]
    with pytest.raises(ValueError):
        table.read(as_of=0.0)          # before the table existed


def test_snapshot_isolation_across_overwrite(spark, table):
    table.append(spark.range(4).select(F.col("id").alias("v")))
    old = table.read()                  # resolves version 1's file list
    table.overwrite(spark.range(100, 101).select(F.col("id").alias("v")))
    # the old reader still sees its snapshot; a new reader sees the head
    assert _rows(old) == [0, 1, 2, 3]
    assert _rows(table.read()) == [100]


def test_delete_where_copy_on_write(spark, table):
    table.append(spark.range(6).select(F.col("id").alias("v")))
    v = table.delete_where("v % 2 = 0")
    assert _rows(table.read()) == [1, 3, 5]
    assert _rows(table.read(version=v - 1)) == [0, 1, 2, 3, 4, 5]
    ops = [m["operation"] for _, m in table.history()]
    assert ops == ["create", "append", "delete"]


def test_commit_conflict_retries_to_next_version(spark, table):
    """A competing writer taking the next version must not be clobbered:
    the loser re-reads the head and lands at head+1."""
    table.append(spark.range(2).select(F.col("id").alias("v")))
    # simulate a concurrent committer grabbing version 2 directly
    table._publish(2, files=table._load_manifest(1)["files"],
                   operation="append", parent=1)
    v = table.append(spark.range(5, 6).select(F.col("id").alias("v")))
    assert v == 3
    assert 5 in _rows(table.read())
    # publishing an already-taken version raises, never replaces
    with pytest.raises(CommitConflict):
        table._publish(3, files=[], operation="append", parent=2)


def test_vacuum_keeps_referenced_files(spark, table):
    table.append(spark.range(2).select(F.col("id").alias("v")))
    table.overwrite(spark.range(7, 9).select(F.col("id").alias("v")))
    table.append(spark.range(9, 10).select(F.col("id").alias("v")))
    removed = table.vacuum(keep_last=2)
    assert removed                       # v0/v1 manifests + orphaned data
    # retained versions still read fine
    assert _rows(table.read()) == [7, 8, 9]
    assert _rows(table.read(version=2)) == [7, 8]
    # vacuumed version is gone
    with pytest.raises(FileNotFoundError):
        table.read(version=1)
    # no dangling data dirs for the vacuumed overwrite victim
    live = {f for _, m in table.history() for f in m["files"]}
    on_disk = {os.path.join(table._data, d, n)
               for d in os.listdir(table._data)
               for n in os.listdir(os.path.join(table._data, d))
               if n.endswith(".parquet")}
    assert on_disk == live


def test_append_once_skips_replayed_txn(spark, table):
    v1 = table.append_once(spark.range(3).select(F.col("id").alias("v")),
                           txn_id="job", txn_version=0)
    assert v1 == 1
    # replay of batch 0: no-op, no new version, no duplicate rows
    assert table.append_once(
        spark.range(3).select(F.col("id").alias("v")),
        txn_id="job", txn_version=0) is None
    assert table.current_version() == 1
    assert _rows(table.read()) == [0, 1, 2]
    # the NEXT batch commits normally
    assert table.append_once(
        spark.range(3, 5).select(F.col("id").alias("v")),
        txn_id="job", txn_version=1) == 2
    assert _rows(table.read()) == [0, 1, 2, 3, 4]
    # a different producer id is independent
    assert table.append_once(
        spark.range(9, 10).select(F.col("id").alias("v")),
        txn_id="other", txn_version=0) == 3


def test_merge_upserts_by_key(spark, table):
    table.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    table.merge(spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"), keys=["k"])
    got = sorted((r["k"], r["v"]) for r in table.read().collect())
    assert got == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    ops = [m["operation"] for _, m in table.history()]
    assert ops[-1] == "merge"


def test_concurrent_appends_race(spark, tmp_path):
    """8 threads appending concurrently: the link+unlink commit protocol
    must serialize them — every append lands in a distinct version and
    no rows are lost or clobbered."""
    from concurrent.futures import ThreadPoolExecutor

    t = SnapshotTable.create(spark, str(tmp_path / "race"))
    dfs = [spark.range(i * 10, i * 10 + 3).select(F.col("id").alias("v"))
           for i in range(8)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        versions = list(pool.map(t.append, dfs))
    assert sorted(versions) == list(range(1, 9))     # all distinct
    want = sorted(v for i in range(8) for v in range(i * 10, i * 10 + 3))
    assert _rows(t.read()) == want


def test_snapshot_sink_stream_exactly_once(spark, tmp_path):
    """Streaming ingest into a SnapshotTable: multi-batch stream equals
    the batch union, and a manual replay of an already-committed batch
    id commits nothing (transactional idempotence)."""
    from datum_spark.streaming import snapshot_sink

    src = str(tmp_path / "in")
    spark.range(20).select(F.col("id").alias("v")) \
        .repartition(4).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    t = SnapshotTable.create(spark, str(tmp_path / "snap"))
    q = snapshot_sink(stream, t, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert _rows(t.read()) == list(range(20))
    head = t.current_version()
    # replay the first batch by hand: append_once must refuse
    assert t.append_once(batch.limit(5), txn_id="snapshot_sink",
                         txn_version=0) is None
    assert t.current_version() == head
    assert _rows(t.read()) == list(range(20))


def test_database_snapshot_table_handle(spark, tmp_path):
    """Database.snapshot_table: datum-style discovery of versioned
    tables inside a warehouse dir; plain .tables stays parquet-only."""
    import datum_spark

    db = datum_spark.connect(str(tmp_path), spark=spark)
    db.create_table("plain", [{"name": "a", "type": "num"}])
    with pytest.raises(ValueError):
        db.snapshot_table("ledger")          # not created yet
    t = db.snapshot_table("ledger", create=True)
    t.append(spark.range(3).select(F.col("id").alias("v")))
    # re-open by name: same data, same history
    t2 = db.snapshot_table("ledger")
    assert _rows(t2.read()) == [0, 1, 2]
    assert [m["operation"] for _, m in t2.history()] == ["create", "append"]
    # versioned tables never shadow the plain-table listing
    assert db.tables == ["plain"]
    with pytest.raises(ValueError):
        db.snapshot_table("bad-name!", create=True)


def test_compact_rewrites_small_files(spark, table):
    for i in range(5):                       # 5 commits of 2 files each
        table.append(spark.range(i * 2, i * 2 + 2)
                     .select(F.col("id").alias("v")).repartition(2))
    n_before = table._load_manifest(table.current_version())["n_files"]
    assert n_before >= 10
    v = table.compact(target_files=2)
    m = table._load_manifest(v)
    assert m["operation"] == "compact" and m["n_files"] <= 2
    assert _rows(table.read()) == list(range(10))
    # pre-compact version still time-travels
    assert _rows(table.read(version=v - 1)) == list(range(10))


def test_schema_evolution_merge_schema(spark, table):
    table.append(spark.createDataFrame([(1,)], "v long"))
    table.append(spark.createDataFrame([(2, "x")], "v long, tag string"))
    got = table.read(merge_schema=True)
    assert set(got.columns) == {"v", "tag"}
    rows = {r["v"]: r["tag"] for r in got.collect()}
    assert rows == {1: None, 2: "x"}


def test_append_once_backwards_scan_stops_at_last_txn(spark, table):
    """The replay check is O(commits since the producer's last one):
    interleaved foreign commits don't hide the producer's newest txn
    version, and the scan survives a vacuumed history prefix."""
    table.append_once(spark.range(2).select(F.col("id").alias("v")),
                      txn_id="p", txn_version=0)
    for i in range(3):                       # foreign commits interleave
        table.append(spark.range(10 + i, 11 + i)
                     .select(F.col("id").alias("v")))
    table.append_once(spark.range(5, 6).select(F.col("id").alias("v")),
                      txn_id="p", txn_version=1)
    assert table._last_txn_version("p") == 1
    assert table._last_txn_version("ghost") == -1
    # replays of both batches are refused
    assert table.append_once(spark.range(2).select(F.col("id").alias("v")),
                             txn_id="p", txn_version=0) is None
    assert table.append_once(spark.range(2).select(F.col("id").alias("v")),
                             txn_id="p", txn_version=1) is None
    # vacuum the prefix: the scan hits the horizon and still behaves
    table.vacuum(keep_last=2)
    assert table.append_once(spark.range(6, 7)
                             .select(F.col("id").alias("v")),
                             txn_id="p", txn_version=2) is not None
