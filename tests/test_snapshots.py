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
    # default min-age keeps YOUNG unreferenced dirs (in-flight writer
    # protection); only the old manifests go
    removed_young = table.vacuum(keep_last=2)
    assert removed_young and all(p.endswith(".json") for p in removed_young)
    removed = table.vacuum(keep_last=2, min_age_seconds=0)
    assert removed                       # now the orphaned data too
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


# ---------------------------------------------------------------------------
# round 8: manifest schema, stats pruning, conflict rebasing, txn races


def test_vacuum_min_age_protects_inflight_commit(spark, table):
    """An unreferenced commit dir younger than min_age is an IN-FLIGHT
    writer's data (written, manifest not yet published): vacuum must
    not delete it."""
    table.append(spark.range(3).select(F.col("id").alias("v")))
    table.overwrite(spark.range(5, 7).select(F.col("id").alias("v")))
    table.append(spark.range(9, 10).select(F.col("id").alias("v")))
    # simulate a concurrent writer mid-commit: data written, no manifest
    files, schema_json, stats = table._write_data(
        spark.range(100, 103).select(F.col("id").alias("v")))
    pending_dir = os.path.dirname(files[0])
    table.vacuum(keep_last=1)            # default min-age: dir survives
    assert os.path.isdir(pending_dir)
    # the writer now publishes — table head must be intact
    table._commit_append(files, schema_json, stats)
    assert 100 in _rows(table.read())
    # once old enough (forced), unreferenced dirs ARE reclaimed
    table.overwrite(spark.range(1).select(F.col("id").alias("v")))
    table.overwrite(spark.range(1).select(F.col("id").alias("v")))
    table.vacuum(keep_last=1, min_age_seconds=0)
    live = {f for _, m in table.history() for f in m["files"]}
    on_disk = {os.path.join(table._data, d, n)
               for d in os.listdir(table._data)
               for n in os.listdir(os.path.join(table._data, d))
               if n.endswith(".parquet")}
    assert on_disk == live


def test_merge_conflict_recomputes_not_lost_update(spark, table):
    """A merge losing the commit race must RECOMPUTE from the new head:
    the concurrently-appended rows survive (the old blind retry
    republished the pre-race file list, silently dropping them)."""
    table.append(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"))
    racer = SnapshotTable(spark, table.path)
    orig_publish = table._publish
    fired = {"done": False}

    def racing_publish(version, files, operation, parent, extra=None):
        if operation == "merge" and not fired["done"]:
            fired["done"] = True         # concurrent append wins the race
            racer.append(spark.createDataFrame([(99, "zz")],
                                               "k long, v string"))
        return orig_publish(version, files, operation, parent, extra=extra)

    table._publish = racing_publish
    table.merge(spark.createDataFrame([(2, "B"), (3, "c")],
                                      "k long, v string"), keys=["k"])
    got = sorted((r["k"], r["v"]) for r in table.read().collect())
    assert got == [(1, "a"), (2, "B"), (3, "c"), (99, "zz")]


def test_empty_snapshot_keeps_schema(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "typed"),
                             schema="k long, v string")
    # v0 is empty but typed: projections and filters on known cols work
    empty = t.read()
    assert empty.columns == ["k", "v"]
    assert empty.filter("k > 0").select("v").count() == 0
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.delete_where("k >= 0")             # delete-all
    again = t.read()
    assert again.columns == ["k", "v"] and again.count() == 0
    assert again.filter("v = 'a'").count() == 0


def test_delete_where_prunes_untouched_files(spark, table):
    """Files whose stats provably miss the predicate are carried by
    REFERENCE across a keyed delete — same paths, zero rewrite."""
    table.append(spark.range(0, 50).select(F.col("id").alias("v"))
                 .coalesce(1))
    table.append(spark.range(100, 150).select(F.col("id").alias("v"))
                 .coalesce(1))
    before = set(table._load_manifest(table.current_version())["files"])
    low = {f for f in before if "commit-" in f}
    v = table.delete_where("v >= 100 AND v < 120")
    after = set(table._load_manifest(v)["files"])
    # the low-range file survives untouched (path identity)
    untouched = before & after
    assert len(untouched) == 1
    assert _rows(table.read()) == list(range(0, 50)) + list(range(120, 150))
    assert low  # sanity


def test_merge_prunes_disjoint_key_ranges(spark, table):
    table.append(spark.range(0, 50).select(F.col("id").alias("k"),
                                           F.lit("old").alias("v"))
                 .coalesce(1))
    table.append(spark.range(100, 150).select(F.col("id").alias("k"),
                                              F.lit("old").alias("v"))
                 .coalesce(1))
    before = set(table._load_manifest(table.current_version())["files"])
    v = table.merge(spark.createDataFrame([(110, "NEW"), (200, "NEW")],
                                          "k long, v string"), keys=["k"])
    after = set(table._load_manifest(v)["files"])
    assert len(before & after) == 1      # 0..49 file untouched
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got[110] == "NEW" and got[200] == "NEW" and got[0] == "old"
    assert len(got) == 101


def test_read_where_file_pruning(spark, table):
    table.append(spark.range(0, 50).select(F.col("id").alias("v"))
                 .coalesce(1))
    table.append(spark.range(100, 150).select(F.col("id").alias("v"))
                 .coalesce(1))
    all_files = table._load_manifest(table.current_version())["files"]
    pruned = table.read(where="v >= 100")
    scanned = {f.replace("file://", "").replace("file:", "")
               for f in pruned.inputFiles()}
    assert scanned < set(all_files)
    assert _rows(pruned) == list(range(100, 150))
    # unparseable predicate: no pruning, same ANSWER
    fancy = table.read(where="v % 2 = 0 AND v >= 100")
    assert _rows(fancy) == list(range(100, 150, 2))


def test_append_once_concurrent_producers_single_commit(spark, tmp_path):
    """Two producers sharing a txn_id racing the SAME txn_version:
    exactly one commits (the check re-runs inside the commit loop)."""
    from concurrent.futures import ThreadPoolExecutor

    t = SnapshotTable.create(spark, str(tmp_path / "txnrace"))
    handles = [SnapshotTable(spark, t.path) for _ in range(4)]
    dfs = [spark.range(3).select(F.col("id").alias("v")) for _ in range(4)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(
            lambda hd: hd[0].append_once(hd[1], txn_id="p", txn_version=7),
            zip(handles, dfs)))
    assert sum(r is not None for r in results) == 1
    assert _rows(t.read()) == [0, 1, 2]
    # aborted committers left no orphan data dirs referenced by nothing?
    # (their dirs are discarded on precondition failure)
    live = {f for _, m in t.history() for f in m["files"]}
    on_disk = {os.path.join(t._data, d, n)
               for d in os.listdir(t._data)
               for n in os.listdir(os.path.join(t._data, d))
               if n.endswith(".parquet")}
    assert on_disk == live


def test_prunable_condition_parser():
    from datum_spark.sources.snapshots import (file_may_match,
                                               parse_prunable_condition)

    terms = parse_prunable_condition(
        "a >= 10 AND b = 'x' AND c BETWEEN 1 AND 5 "
        "AND d IN (1, 2) AND e IS NOT NULL AND 3 < f")
    assert terms is not None and len(terms) == 6
    assert ("cmp", "f", ">", 3) in terms
    # outside the grammar -> None (no pruning, full rewrite)
    for bad in ("a % 2 = 0", "a = 1 OR b = 2", "NOT a = 1",
                "upper(b) = 'X'", "a = b"):
        assert parse_prunable_condition(bad) is None, bad
    st = {"a": {"min": 0, "max": 9, "nulls": 0, "rows": 10, "exact": True}}
    assert not file_may_match(st, [("cmp", "a", ">=", 10)])
    assert file_may_match(st, [("cmp", "a", ">=", 9)])
    assert not file_may_match(st, [("between", "a", 10, 20)])
    assert not file_may_match(st, [("in", "a", [12, 15])])
    assert file_may_match(st, [("in", "a", [5, 15])])
    assert not file_may_match(st, [("null", "a", True)])     # no nulls
    # inexact stats never prune
    st2 = {"a": {"min": 0, "max": 9, "nulls": 0, "rows": 10,
                 "exact": False}}
    assert file_may_match(st2, [("cmp", "a", ">=", 10)])
    # type-mismatched literal never prunes
    assert file_may_match(st, [("cmp", "a", "=", "zz")])


def test_clustered_compact_enables_pruning(spark, table):
    """compact(cluster_by=...) range-partitions the rewrite so file
    stats become disjoint ranges — a keyed delete afterwards rewrites
    only the overlapping file(s)."""
    import random
    rng = random.Random(3)
    vals = list(range(400))
    rng.shuffle(vals)
    # two shuffled appends: every file spans ~the full value range
    table.append(spark.createDataFrame([(v,) for v in vals[:200]],
                                       "v long").repartition(4))
    table.append(spark.createDataFrame([(v,) for v in vals[200:]],
                                       "v long").repartition(4))
    # unclustered: a range delete touches everything
    m0 = table._load_manifest(table.current_version())
    terms0 = [("cmp", "v", ">=", 300)]
    from datum_spark.sources.snapshots import file_may_match
    touched0 = [f for f in m0["files"]
                if file_may_match(m0.get("file_stats", {}).get(f, {}),
                                  terms0)]
    assert len(touched0) == len(m0["files"])    # all files overlap
    v = table.compact(target_files=4, cluster_by=["v"])
    m1 = table._load_manifest(v)
    touched1 = [f for f in m1["files"]
                if file_may_match(m1.get("file_stats", {}).get(f, {}),
                                  terms0)]
    assert 0 < len(touched1) < len(m1["files"])  # ranges now disjoint
    before = set(m1["files"])
    v2 = table.delete_where("v >= 300")
    after = set(table._load_manifest(v2)["files"])
    assert before & after                       # low-range files kept
    assert _rows(table.read()) == list(range(300))


# -- schema evolution ------------------------------------------------------


def test_evolved_append_adds_nullable_column(spark, table):
    table.append(spark.range(2).select(F.col("id").alias("v")))
    table.append(spark.range(2, 4).select(F.col("id").alias("v"),
                                          F.lit("b").alias("tag")))
    head = table.read()
    assert head.columns == ["v", "tag"]
    got = {r["v"]: r["tag"] for r in head.collect()}
    assert got == {0: None, 1: None, 2: "b", 3: "b"}
    # time travel: version 1 keeps its own (pre-evolution) schema
    assert table.read(version=1).columns == ["v"]


def test_append_missing_column_fills_null(spark, table):
    table.append(spark.range(1).select(F.col("id").alias("v"),
                                       F.lit(7.5).alias("score")))
    table.append(spark.range(1, 2).select(F.col("id").alias("v")))
    got = {r["v"]: r["score"] for r in table.read().collect()}
    assert got == {0: 7.5, 1: None}


def test_type_conflict_raises_and_discards(spark, table):
    from datum_spark.sources.snapshots import SchemaConflict

    table.append(spark.range(1).select(F.col("id").alias("v")))
    with pytest.raises(SchemaConflict):
        table.append(spark.range(1).select(
            F.col("id").cast("string").alias("v")))
    # the failed append's commit dir was discarded; head is unchanged
    assert table.current_version() == 1
    assert _rows(table.read()) == [0]
    files_on_disk = {os.path.join(d, n)
                     for d, _, ns in os.walk(table._data) for n in ns
                     if n.endswith(".parquet")}
    referenced = set(table._load_manifest(1)["files"])
    assert files_on_disk == referenced


def test_add_columns_metadata_only(spark, table):
    table.append(spark.range(3).select(F.col("id").alias("v")))
    files_before = set(table._load_manifest(1)["files"])
    v = table.add_columns("tag string, score double")
    m = table.history()[-1][1]
    assert m["operation"] == "evolve-schema"
    assert set(m["files"]) == files_before          # no data written
    head = table.read()
    assert head.columns == ["v", "tag", "score"]
    assert head.filter("tag IS NULL").count() == 3
    from datum_spark.sources.snapshots import SchemaConflict
    with pytest.raises(SchemaConflict):
        table.add_columns("v long")
    assert table.current_version() == v


def test_drop_columns_metadata_only(spark, table):
    table.append(spark.range(3).select(F.col("id").alias("v"),
                                       (F.col("id") * 2).alias("w")))
    table.drop_columns(["w"])
    assert table.read().columns == ["v"]
    # the bytes are still there: the PREVIOUS version maps them
    assert table.read(version=1).columns == ["v", "w"]
    with pytest.raises(ValueError):
        table.drop_columns(["nope"])


def test_merge_with_evolved_upsert(spark, table):
    table.append(spark.range(4).select(F.col("id").alias("k"),
                                       F.lit("old").alias("v")))
    up = spark.createDataFrame([(2, "new", 1.5), (9, "new", 2.5)],
                               "k long, v string, score double")
    table.merge(up, keys=["k"])
    got = {r["k"]: (r["v"], r["score"]) for r in table.read().collect()}
    assert got == {0: ("old", None), 1: ("old", None),
                   2: ("new", 1.5), 3: ("old", None), 9: ("new", 2.5)}


def test_schema_survives_pruned_merge(spark, table):
    """Stats-pruning can leave the rewrite as JUST the upsert side; the
    published schema must still carry parent-only columns."""
    table.append(spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)],
                                       "k long, v string, extra double"))
    up = spark.createDataFrame([(100, "z")], "k long, v string")
    table.merge(up, keys=["k"])          # k=100 misses every file range
    head = table.read()
    assert set(head.columns) == {"k", "v", "extra"}
    got = {r["k"]: r["extra"] for r in head.collect()}
    assert got == {1: 10.0, 2: 20.0, 100: None}


def test_compact_after_evolution_materializes_schema(spark, table):
    table.append(spark.range(2).select(F.col("id").alias("v")))
    table.append(spark.range(2, 4).select(F.col("id").alias("v"),
                                          F.lit(1).alias("n")))
    table.compact(target_files=1)
    head = table.read()
    assert head.columns == ["v", "n"]
    assert head.count() == 4
    # post-compact, delete on the evolved column works end to end
    table.delete_where("n = 1")
    assert _rows(table.read()) == [0, 1]


def test_empty_after_evolution_keeps_schema(spark, table):
    table.append(spark.range(1).select(F.col("id").alias("v")))
    table.add_columns("tag string")
    table.delete_where("v >= 0")
    head = table.read()
    assert head.columns == ["v", "tag"]
    assert head.count() == 0


# ------------------------------------------------- merge-on-read deletes

def _data_files(table, version=None):
    v = table.current_version() if version is None else version
    return sorted(table._load_manifest(v)["files"])


def test_mor_delete_rewrites_nothing(spark, table):
    table.append(spark.range(10).select(F.col("id").alias("v")))
    files_before = _data_files(table)
    sizes_before = {f: os.path.getsize(f) for f in files_before}
    v = table.delete_where("v >= 7", mode="mor")
    assert v == 2
    assert _rows(table.read()) == [0, 1, 2, 3, 4, 5, 6]
    # identical file list, byte-identical files — only refs were added
    assert _data_files(table) == files_before
    assert {f: os.path.getsize(f) for f in files_before} == sizes_before
    assert table._load_manifest(v).get("delete_files")


def test_mor_delete_time_travels(spark, table):
    table.append(spark.range(4).select(F.col("id").alias("v")))
    table.delete_where("v = 2", mode="mor")
    assert _rows(table.read(version=1)) == [0, 1, 2, 3]
    assert _rows(table.read()) == [0, 1, 3]


def test_mor_deletes_accumulate_and_compact_materializes(spark, table):
    table.append(spark.range(8).select(F.col("id").alias("v")))
    table.delete_where("v IN (1, 2)", mode="mor")
    table.delete_where("v = 5", mode="mor")
    assert _rows(table.read()) == [0, 3, 4, 6, 7]
    assert len(table._load_manifest(table.current_version())
               .get("delete_files")) >= 2
    vc = table.compact(target_files=1)
    m = table._load_manifest(vc)
    assert not m.get("delete_files")      # refs dropped after rewrite
    assert _rows(table.read()) == [0, 3, 4, 6, 7]


def test_mor_delete_survives_append_and_merge(spark, table):
    table.append(spark.range(6).select(F.col("id").alias("v"),
                                       (F.col("id") * 10).alias("w")))
    table.delete_where("v = 3", mode="mor")
    table.append(spark.createDataFrame([(100, 0)], "v long, w long"))
    assert sorted(r["v"] for r in table.read().collect()) \
        == [0, 1, 2, 4, 5, 100]
    # a keyed merge must not resurrect the deleted row
    table.merge(spark.createDataFrame([(0, 999)], "v long, w long"),
                keys=["v"])
    got = {r["v"]: r["w"] for r in table.read().collect()}
    assert 3 not in got
    assert got[0] == 999


def test_mor_delete_noop_when_stats_prune_everything(spark, table):
    table.append(spark.range(5).select(F.col("id").alias("v")))
    head = table.current_version()
    assert table.delete_where("v > 1000", mode="mor") == head
    assert table.current_version() == head     # no commit published


def test_mor_delete_already_deleted_rows_not_readded(spark, table):
    table.append(spark.range(5).select(F.col("id").alias("v")))
    table.delete_where("v >= 3", mode="mor")
    v = table.delete_where("v >= 2", mode="mor")   # overlaps prior refs
    refs = spark.read.parquet(
        *table._load_manifest(v)["delete_files"])
    assert refs.count() == 3                        # 2 + (3, 4) once each
    assert refs.distinct().count() == 3
    assert _rows(table.read()) == [0, 1]


def test_mor_refs_survive_vacuum(spark, table):
    table.append(spark.range(4).select(F.col("id").alias("v")))
    table.delete_where("v = 0", mode="mor")
    table.append(spark.range(10, 12).select(F.col("id").alias("v")))
    removed = table.vacuum(keep_last=2, min_age_seconds=0.0)
    assert _rows(table.read()) == [1, 2, 3, 10, 11]
    dv = table._load_manifest(table.current_version())["delete_files"]
    assert all(os.path.exists(f) for f in dv)
    assert removed is not None


def test_mor_delete_rejects_unknown_mode(spark, table):
    table.append(spark.range(2).select(F.col("id").alias("v")))
    with pytest.raises(ValueError):
        table.delete_where("v = 0", mode="nope")


def test_mor_delete_races_appends(spark, table):
    """A MOR delete racing concurrent appends must never corrupt the
    head: even keys (never deleted) all survive exactly once, odd keys
    are a subset of what was appended, and every read plans cleanly."""
    import threading

    table.append(spark.range(0, 100).select(F.col("id").alias("v")))
    errs = []

    def appender():
        try:
            for i in range(1, 5):
                table.append(spark.range(i * 100, i * 100 + 100)
                             .select(F.col("id").alias("v")))
        except Exception as e:          # noqa: BLE001
            errs.append(e)

    def deleter():
        try:
            for _ in range(3):
                table.delete_where("v % 2 = 1", mode="mor")
        except Exception as e:          # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=appender),
          threading.Thread(target=deleter)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    rows = [r["v"] for r in table.read().collect()]
    assert len(rows) == len(set(rows))            # no duplicates
    evens = {v for v in rows if v % 2 == 0}
    assert evens == set(range(0, 500, 2))         # nothing lost
    # a final delete leaves no odd rows at all
    table.delete_where("v % 2 = 1", mode="mor")
    assert all(v % 2 == 0 for v in
               (r["v"] for r in table.read().collect()))


# ---------------------------------------------------------------------------
# incremental change feed (CDC between versions)

def _feed(table, v_from, v_to=None):
    out = table.changes(v_from, v_to)
    ins = sorted(tuple(r) for r in
                 out.filter("_change_type = 'insert'")
                    .drop("_change_type").collect())
    dels = sorted(tuple(r) for r in
                  out.filter("_change_type = 'delete'")
                     .drop("_change_type").collect())
    return ins, dels


def _cdc_invariant(table, v_from, v_to):
    """read(to) must equal read(from) - deletes + inserts as multisets."""
    from collections import Counter

    ins, dels = _feed(table, v_from, v_to)
    before = Counter(tuple(r) for r in table.read(version=v_from).collect())
    after = Counter(tuple(r) for r in table.read(version=v_to).collect())
    rebuilt = before - Counter(dels) + Counter(ins)
    assert rebuilt == after
    # and nothing spurious: a delete must come from `before`
    assert not (Counter(dels) - before)


def test_changes_append_only(spark, table):
    table.append(spark.range(3).select(F.col("id").alias("v")))
    table.append(spark.range(3, 5).select(F.col("id").alias("v")))
    ins, dels = _feed(table, 1, 2)
    assert ins == [(3,), (4,)] and dels == []
    ins, dels = _feed(table, 0)          # to head, from empty v0
    assert ins == [(0,), (1,), (2,), (3,), (4,)] and dels == []
    _cdc_invariant(table, 0, 2)


def test_changes_merge_touches_only_changed_keys(spark, table):
    table.append(spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "k long, v double"))
    table.merge(spark.createDataFrame(
        [(3, 30.0), (99, 99.0)], "k long, v double"), keys=["k"])
    ins, dels = _feed(table, 1, 2)
    assert (3, 30.0) in ins and (99, 99.0) in ins
    assert (3, 3.0) in dels
    # carried-over rows of the rewritten file cancel in the diff:
    # nothing but the touched key appears on the delete side
    assert dels == [(3, 3.0)]
    _cdc_invariant(table, 1, 2)


def test_changes_mor_delete_and_compact(spark, table):
    table.append(spark.range(10).select(F.col("id").alias("v")))
    table.delete_where("v >= 7", mode="mor")
    ins, dels = _feed(table, 1, 2)
    assert ins == [] and dels == [(7,), (8,), (9,)]
    _cdc_invariant(table, 1, 2)
    v3 = table.compact()
    # compaction is a pure rewrite: empty feed
    ins, dels = _feed(table, 2, v3)
    assert ins == [] and dels == []


def test_changes_cow_delete_and_overwrite(spark, table):
    table.append(spark.range(6).select(F.col("id").alias("v")))
    table.delete_where("v = 2")                     # COW rewrite
    _cdc_invariant(table, 1, 2)
    ins, dels = _feed(table, 1, 2)
    assert ins == [] and dels == [(2,)]
    table.overwrite(spark.range(100, 102).select(F.col("id").alias("v")))
    ins, dels = _feed(table, 2, 3)
    assert ins == [(100,), (101,)]
    assert dels == [(0,), (1,), (3,), (4,), (5,)]


def test_changes_schema_evolution_null_fill(spark, table):
    table.append(spark.createDataFrame([(1,)], "k long"))
    table.append(spark.createDataFrame([(2, "b")], "k long, tag string"))
    table.delete_where("k = 1")
    # feed in the head's (evolved) schema: the deleted old-schema row
    # reads tag as NULL
    out = table.changes(2, 3)
    assert set(out.columns) == {"k", "tag", "_change_type"}
    rows = {(r["k"], r["tag"], r["_change_type"]) for r in out.collect()}
    assert rows == {(1, None, "delete")}


def test_changes_rejects_reversed_range(spark, table):
    table.append(spark.range(2).select(F.col("id").alias("v")))
    with pytest.raises(ValueError):
        table.changes(1, 0)


def test_change_feed_cursor_exactly_once(spark, table, tmp_path):
    """poll() hands each committed version range to the consumer exactly
    once, survives process restart via the checkpoint file, and returns
    None when the head hasn't moved."""
    from datum_spark.sources.snapshots import ChangeFeedCursor

    ckpt = str(tmp_path / "cursor.json")
    cur = ChangeFeedCursor(table, ckpt)         # table at v0 (empty)
    assert cur.poll() is None

    table.append(spark.range(3).select(F.col("id").alias("v")))
    batch = cur.poll()
    assert sorted(r["v"] for r in batch.collect()) == [0, 1, 2]
    assert {r["_change_type"] for r in batch.collect()} == {"insert"}
    assert cur.poll() is None                   # offset advanced

    # two commits between polls arrive as ONE range
    table.append(spark.range(3, 5).select(F.col("id").alias("v")))
    table.delete_where("v = 0")
    batch = cur.poll()
    got = {(r["v"], r["_change_type"]) for r in batch.collect()}
    assert got == {(3, "insert"), (4, "insert"), (0, "delete")}

    # restart: a NEW cursor on the same checkpoint resumes, not replays
    cur2 = ChangeFeedCursor(table, ckpt)
    assert cur2.version == cur.version
    assert cur2.poll() is None
    table.append(spark.range(10, 11).select(F.col("id").alias("v")))
    assert [r["v"] for r in cur2.poll().collect()] == [10]


def test_change_feed_cursor_manual_commit(spark, table, tmp_path):
    """autocommit=False: a crash between poll and commit replays the
    batch (at-least-once), commit() advances durably."""
    from datum_spark.sources.snapshots import ChangeFeedCursor

    ckpt = str(tmp_path / "c2.json")
    table.append(spark.range(2).select(F.col("id").alias("v")))
    cur = ChangeFeedCursor(table, ckpt, start_version=0, autocommit=False)
    b1 = cur.poll()
    assert b1.count() == 2
    # no commit -> a restarted consumer re-polls the same range
    cur_crash = ChangeFeedCursor(table, ckpt, autocommit=False)
    assert cur_crash.poll().count() == 2
    cur_crash.commit()
    assert ChangeFeedCursor(table, ckpt).poll() is None


def test_changes_invariant_random_ops(spark, table):
    """Property: for a seeded random op sequence (append / merge / COW
    delete / MOR delete / overwrite / compact), the CDC invariant
    read(to) == read(from) - deletes + inserts holds for every adjacent
    version pair AND for spans, including across compaction."""
    import random

    rng = random.Random(80)
    table.append(spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"))
    nxt = 1000
    for step in range(8):
        op = rng.choice(["append", "merge", "cow", "mor",
                         "overwrite", "compact"])
        if op == "append":
            table.append(spark.createDataFrame(
                [(nxt + i, float(i)) for i in range(5)],
                "k long, v double"))
            nxt += 5
        elif op == "merge":
            ks = rng.sample(range(40), 3)
            table.merge(spark.createDataFrame(
                [(k, -float(step)) for k in ks] + [(nxt, 0.5)],
                "k long, v double"), keys=["k"])
            nxt += 1
        elif op == "cow":
            table.delete_where(f"k % 7 = {rng.randrange(7)}")
        elif op == "mor":
            table.delete_where(f"k % 5 = {rng.randrange(5)}", mode="mor")
        elif op == "overwrite":
            table.overwrite(spark.createDataFrame(
                [(i, 9.0) for i in range(30)], "k long, v double"))
        else:
            table.compact(target_files=2)
    head = table.current_version()
    for v in range(1, head):
        _cdc_invariant(table, v, v + 1)
    _cdc_invariant(table, 1, head)
    _cdc_invariant(table, head // 2, head)


def test_feed_drives_incremental_dedup(spark, table, tmp_path):
    """The round-8 composition: a snapshot table ingests document
    batches, a ChangeFeedCursor hands each delta to
    incremental_near_dups_md5 against the pre-delta corpus — the lake
    feeds the x109 daily-ingest dedup with NO full-corpus rescan and
    no missed/duplicated delta rows."""
    from datum_spark.operators.dedup import incremental_near_dups_md5
    from datum_spark.sources.snapshots import ChangeFeedCursor
    from datum_spark.sources.registry import read_parquet_normalized

    docs = read_parquet_normalized(
        spark, "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    table.append(docs.filter("doc_id < 60"))          # initial corpus
    cur = ChangeFeedCursor(table, str(tmp_path / "c.json"))

    # batch 1: near-dup-seeded fixture rows overlapping the corpus
    table.append(docs.filter("doc_id >= 60 and doc_id < 90"))
    batch = cur.poll().filter("_change_type = 'insert'") \
               .select("doc_id", "text")
    corpus = table.read(version=1)
    pairs = incremental_near_dups_md5(batch, corpus, "doc_id", "text",
                                      threshold=0.5)
    got = {(r["delta_id"], r["corpus_id"]) for r in pairs.collect()}
    # every reported pair is delta×corpus, never corpus×corpus
    assert all(60 <= a < 90 and b < 60 for a, b in got)
    # ground truth from the batch-mode operator on the union
    from datum_spark.operators.dedup import minhash_near_dups_md5
    both = corpus.union(batch)
    full = {(max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
            for r in minhash_near_dups_md5(both, "doc_id", "text",
                                            threshold=0.5).collect()
            if (r["id_a"] < 60) != (r["id_b"] < 60)}
    assert got == {(a, b) for a, b in full if a >= 60}
    # idle poll after consumption: nothing
    assert cur.poll() is None


# round 9: temporal stats must never mis-prune (ADVICE r8 high)


def test_timestamp_where_keeps_midnight_boundary(spark, table):
    """``ts <= '2024-06-01'`` must KEEP the file whose min is exactly
    2024-06-01 00:00:00 — Spark casts the literal to a timestamp, but
    the old lexicographic str-compare pruned it ('... 00:00:00' >
    '2024-06-01' as strings), silently dropping rows."""
    import datetime

    table.append(spark.createDataFrame(
        [(1, datetime.datetime(2024, 6, 1, 0, 0, 0))],
        "k long, ts timestamp").coalesce(1))
    table.append(spark.createDataFrame(
        [(2, datetime.datetime(2024, 7, 1, 12, 0, 0))],
        "k long, ts timestamp").coalesce(1))
    got = sorted(r["k"] for r in
                 table.read(where="ts <= '2024-06-01'").collect())
    assert got == [1]
    # '=' on a date-only literal keeps the matching file too
    assert [r["k"] for r in
            table.read(where="ts = '2024-06-01'").collect()] == [1]
    # delete_where routes candidates through the same stats check:
    # the boundary row must actually be deleted, not silently skipped
    table.delete_where("ts <= '2024-06-01'")
    assert [r["k"] for r in table.read().collect()] == [2]


def test_date_stats_prune_iso_literals_only(spark, table):
    """DATE columns still prune — but only against pure YYYY-MM-DD
    literals (ISO text orders lexicographically = chronologically);
    any other spelling conservatively skips pruning on that term."""
    import datetime

    from datum_spark.sources.snapshots import (file_may_match,
                                               parse_prunable_condition)

    table.append(spark.createDataFrame(
        [(1, datetime.date(2024, 1, 15))], "k long, d date").coalesce(1))
    table.append(spark.createDataFrame(
        [(2, datetime.date(2024, 6, 15))], "k long, d date").coalesce(1))
    all_files = table._load_manifest(table.current_version())["files"]
    pruned = table.read(where="d >= '2024-06-01'")
    scanned = {f.replace("file://", "").replace("file:", "")
               for f in pruned.inputFiles()}
    assert scanned < set(all_files)          # ISO literal DOES prune
    assert [r["k"] for r in pruned.collect()] == [2]

    # unit level: non-ISO spellings never prune a date-tagged column
    stats = {"d": {"min": "2024-01-15", "max": "2024-01-15",
                   "nulls": 0, "rows": 1, "exact": True, "t": "date"}}
    assert not file_may_match(
        stats, parse_prunable_condition("d >= '2024-06-01'"))
    for cond in ("d >= '2024-6-1'",            # unpadded
                 "d = '2024-06-01 00:00:00'",  # time component
                 "d BETWEEN '2024-6-1' AND '2024-7-1'",
                 "d IN ('2024-6-1')"):
        assert file_may_match(stats, parse_prunable_condition(cond)), cond
    # the same strings on an UNtagged (plain string) column still prune
    plain = {"d": {"min": "2024-01-15", "max": "2024-01-15",
                   "nulls": 0, "rows": 1, "exact": True}}
    assert not file_may_match(
        plain, parse_prunable_condition("d >= '2024-6-1'"))


def test_timestamp_stats_emit_no_minmax(spark, table):
    """Footer stats for timestamp columns must come back inexact — the
    pruning layer cannot reason about session-timezone casts."""
    import datetime

    from datum_spark.sources.snapshots import _file_column_stats

    table.append(spark.createDataFrame(
        [(1, datetime.datetime(2024, 6, 1))], "k long, ts timestamp")
        .coalesce(1))
    f = table._load_manifest(table.current_version())["files"][0]
    st = _file_column_stats(f)
    assert st["ts"]["exact"] is False
    assert st["k"]["exact"] is True and st["k"]["min"] == 1


# round 9: txn checkpoints bound the append_once idempotence walk


def test_checkpoint_written_and_answers_txn(spark, tmp_path):
    """Every Nth commit publishes a checkpoint folding the txn
    high-water marks; _last_txn_version answers from it without
    walking past the checkpoint."""
    t = SnapshotTable.create(spark, str(tmp_path / "ck"),
                             checkpoint_interval=5)
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 8):
        t.append_once(df, txn_id="prod-a", txn_version=i)
    assert os.path.exists(t._checkpoint_path(5))
    ck = t._latest_checkpoint(t.current_version())
    assert ck["version"] == 5 and ck["txn"] == {"prod-a": 5}
    # the walk floor is the checkpoint: marks at or below it come from
    # the folded map even when the manifests themselves are gone
    assert t._last_txn_version("prod-a") == 7
    for v in range(0, 6):
        os.unlink(t._manifest_path(v))
    assert t._last_txn_version("prod-a") == 7          # tail walk
    assert t._last_txn_version("prod-a", head=5) == 5  # checkpoint map
    assert t._last_txn_version("never-seen") == -1
    # idempotence still holds across the vacuumed range
    assert t.append_once(df, txn_id="prod-a", txn_version=3) is None


def test_checkpoint_preserves_marks_past_vacuum(spark, tmp_path):
    """vacuum drops old manifests AND superseded checkpoints, but the
    newest checkpoint keeps every producer's high-water mark — a
    replayed old batch is still a no-op afterwards."""
    t = SnapshotTable.create(spark, str(tmp_path / "ckv"),
                             checkpoint_interval=3)
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 8):
        t.append_once(df, txn_id="prod-b", txn_version=i)
    assert os.path.exists(t._checkpoint_path(3))
    assert os.path.exists(t._checkpoint_path(6))
    t.vacuum(keep_last=2, min_age_seconds=0)
    assert not os.path.exists(t._checkpoint_path(3))   # superseded
    assert os.path.exists(t._checkpoint_path(6))
    assert t._last_txn_version("prod-b") == 7
    assert t.append_once(df, txn_id="prod-b", txn_version=2) is None
    # new producers commit normally after vacuum
    assert t.append_once(df, txn_id="prod-c", txn_version=1) is not None


def test_checkpoint_is_pure_optimization(spark, tmp_path):
    """Deleting every checkpoint (and the pointer) changes no answer —
    consumers fall back to the full manifest walk."""
    t = SnapshotTable.create(spark, str(tmp_path / "cko"),
                             checkpoint_interval=4)
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 7):
        t.append_once(df, txn_id="p", txn_version=i)
    before = t._last_txn_version("p")
    for n in os.listdir(t._manifests):
        if n.startswith("ckpt-") or n == "_last_checkpoint.json":
            os.unlink(os.path.join(t._manifests, n))
    assert t._last_txn_version("p") == before == 6
    assert t.append_once(df, txn_id="p", txn_version=6) is None


def test_feed_drives_incremental_ann_index(spark, tmp_path):
    """Round-9 composition: an embeddings lake table feeds the
    transactional IVF-PQ index through a ChangeFeedCursor — each polled
    batch is assign+encoded against the frozen quantizers and committed
    with the FEED VERSION as the txn version, so a crashed-and-replayed
    batch (at-least-once consumption) lands in the index exactly once
    and queries immediately see the new vectors."""
    from datum_spark.operators.similarity import (ivfpq_index_add,
                                                  ivfpq_index_build,
                                                  ivfpq_index_query)
    from datum_spark.sources.snapshots import ChangeFeedCursor

    rows = [(i, [float(200 * (i % 3)) + (i % 7) * 0.01] * 8)
            for i in range(60)]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    lake = SnapshotTable.create(spark, str(tmp_path / "emb"))
    lake.append(emb)
    idx = str(tmp_path / "idx")
    ivfpq_index_build(lake.read(), idx, ncells=3, m=2, ksub=4,
                      transactional=True)
    cur = ChangeFeedCursor(lake, str(tmp_path / "cur.json"),
                           autocommit=False)

    # two ingest batches land in the lake
    lake.append(spark.createDataFrame(
        [(1000 + j, [0.005 + j * 0.001] * 8) for j in range(3)],
        "vec_id long, embedding array<double>"))
    lake.append(spark.createDataFrame(
        [(2000 + j, [200.005 + j * 0.001] * 8) for j in range(2)],
        "vec_id long, embedding array<double>"))
    batch = cur.poll().filter("_change_type = 'insert'") \
               .select("vec_id", "embedding")
    n = ivfpq_index_add(batch, idx, txn_id="feed",
                        txn_version=cur._pending)
    assert n == 5
    # crash before cur.commit(): the replayed poll is a no-op add
    cur2 = ChangeFeedCursor(lake, str(tmp_path / "cur.json"),
                            autocommit=False)
    replay = cur2.poll().filter("_change_type = 'insert'") \
                 .select("vec_id", "embedding")
    assert ivfpq_index_add(replay, idx, txn_id="feed",
                           txn_version=cur2._pending) == 0
    cur2.commit()
    # the index serves the new vectors, exactly once each
    got = ivfpq_index_query(emb.filter("vec_id = 0"), idx,
                            k=23, nprobe=1).collect()
    ids = [r["vec_id"] for r in got]
    assert {1000, 1001, 1002} <= set(ids)
    assert len(ids) == len(set(ids))
    # the 200.x batch lands in blob 1's cell (vec 1's home)
    got2 = ivfpq_index_query(emb.filter("vec_id = 1"), idx,
                             k=22, nprobe=1).collect()
    assert {2000, 2001} <= {r["vec_id"] for r in got2}


def test_checkpoint_pointer_stale_falls_back_to_scan(spark, tmp_path):
    """A pointer naming a deleted checkpoint file must not blind the
    reader to an older checkpoint still on disk."""
    t = SnapshotTable.create(spark, str(tmp_path / "ckp"),
                             checkpoint_interval=3)
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 8):
        t.append_once(df, txn_id="p", txn_version=i)
    # both ckpt-3 and ckpt-6 exist; delete the one the pointer names
    assert os.path.exists(t._checkpoint_path(6))
    os.unlink(t._checkpoint_path(6))
    ck = t._latest_checkpoint(t.current_version())
    assert ck is not None and ck["version"] == 3   # scan found the older
    assert t._last_txn_version("p") == 7


def test_txn_marks_survive_vacuum_gap(spark, tmp_path):
    """A producer whose last commit falls in a vacuumed RANGE (above
    the last interval checkpoint) must still be answered: vacuum folds
    a horizon checkpoint before deleting, and the walk consults the
    checkpoint map when it hits the gap instead of returning -1 (the
    code-review double-commit scenario)."""
    t = SnapshotTable.create(spark, str(tmp_path / "gap"),
                             checkpoint_interval=10 ** 9)  # never auto
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 6):
        t.append_once(df, txn_id="p", txn_version=i)
    t.append(df)
    t.append(df)                       # head now 7; p's mark at v5
    t.vacuum(keep_last=2, min_age_seconds=0)   # drops v0–v5 manifests
    assert not os.path.exists(t._manifest_path(5))
    assert t._last_txn_version("p") == 5       # from the horizon ckpt
    assert t.append_once(df, txn_id="p", txn_version=5) is None
    assert t.read().count() == 7               # no double commit
    assert t.append_once(df, txn_id="p", txn_version=6) is not None


def test_checkpoint_interval_zero_disables_cleanly(spark, tmp_path):
    """interval=0 must mean 'no interval checkpoints', not a
    ZeroDivisionError AFTER the manifest published."""
    t = SnapshotTable.create(spark, str(tmp_path / "ck0"),
                             checkpoint_interval=0)
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 4):
        assert t.append_once(df, txn_id="p", txn_version=i) == i
    assert t.read().count() == 3
    assert not [n for n in os.listdir(t._manifests)
                if n.startswith("ckpt-v")]


def test_cursor_process_replays_after_crash(spark, table, tmp_path):
    """process(fn) commits the offset ONLY after fn returns: a crash
    inside fn replays the same batch on the next call (at-least-once),
    and a successful fn never sees that batch again."""
    from datum_spark.sources.snapshots import ChangeFeedCursor

    ckpt = str(tmp_path / "cur.json")
    cur = ChangeFeedCursor(table, ckpt)          # offset pinned at head
    table.append(spark.range(3).select(F.col("id").alias("v")))
    seen: list[list[int]] = []

    def boom(df):
        seen.append(sorted(r["v"] for r in df.collect()))
        raise RuntimeError("crash mid-processing")

    with pytest.raises(RuntimeError):
        cur.process(boom)
    assert seen == [[0, 1, 2]]
    # restart from the persisted checkpoint: the batch replays
    cur2 = ChangeFeedCursor(table, ckpt)
    assert cur2.version == 0
    assert cur2.process(lambda df: seen.append(
        sorted(r["v"] for r in df.collect()))) is True
    assert seen == [[0, 1, 2], [0, 1, 2]]        # replayed once
    assert cur2.process(lambda df: seen.append([])) is False
    table.append(spark.range(3, 5).select(F.col("id").alias("v")))
    assert cur2.process(lambda df: seen.append(
        sorted(r["v"] for r in df.collect()))) is True
    assert seen[-1] == [3, 4]                    # only the new delta
