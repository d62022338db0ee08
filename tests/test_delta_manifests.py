"""Delta-manifest commit format (r10): commits write O(changed files)
docs; resolution reconstructs the full file list from the nearest base
(checkpoint / full-mode manifest); vacuum keeps the bases alive."""

import json
import os

import pytest
from pyspark.sql import functions as F

from datum_spark.sources.snapshots import (SnapshotTable,
                                            VacuumAbortedWarning)


def _rows(df):
    return sorted(r["v"] for r in df.collect())


def _raw(t, v):
    with open(t._manifest_path(v)) as fh:
        return json.load(fh)


def test_commit_docs_are_deltas(spark, tmp_path):
    """Append/delete manifests carry only the changed files — the
    commit write no longer scales with table size."""
    t = SnapshotTable.create(spark, str(tmp_path / "d"))
    for lo in (0, 3, 6):
        t.append(spark.range(lo, lo + 3).select(F.col("id").alias("v")))
    d1, d3 = _raw(t, 1), _raw(t, 3)
    assert "files" not in d3 and "file_stats" not in d3
    assert d3["files_removed"] == []
    assert set(d3["stats_added"]) == set(d3["files_added"])
    # the third append's doc mentions ITS files only, not v1's
    assert not set(d1["files_added"]) & set(d3["files_added"])
    resolved = t._load_manifest(3)
    assert set(resolved["files"]) == (set(d1["files_added"])
                                      | set(_raw(t, 2)["files_added"])
                                      | set(d3["files_added"]))
    assert _rows(t.read()) == list(range(9))


def test_rewrite_docs_record_removals(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "rw"))
    t.append(spark.range(6).select(F.col("id").alias("v")))
    t.overwrite(spark.range(100, 102).select(F.col("id").alias("v")))
    d = _raw(t, 2)
    assert set(d["files_removed"]) == set(_raw(t, 1)["files_added"])
    assert _rows(t.read()) == [100, 101]
    assert _rows(t.read(version=1)) == [0, 1, 2, 3, 4, 5]


def test_fresh_instance_resolves_cold(spark, tmp_path):
    """A new SnapshotTable object (empty cache) must reconstruct every
    version from disk alone."""
    p = str(tmp_path / "cold")
    t = SnapshotTable.create(spark, p)
    for lo in range(0, 12, 3):
        t.append(spark.range(lo, lo + 3).select(F.col("id").alias("v")))
    t2 = SnapshotTable(spark, p)
    for v, upto in ((1, 3), (2, 6), (3, 9), (4, 12)):
        assert _rows(t2.read(version=v)) == list(range(upto))


def test_resolution_across_vacuum_horizon(spark, tmp_path):
    """After vacuum drops old manifests, the retained delta chain
    resolves from the horizon checkpoint — cold cache, no ancestor
    manifests on disk."""
    p = str(tmp_path / "hz")
    t = SnapshotTable.create(spark, p,
                             checkpoint_interval=10 ** 9)
    for lo in range(0, 21, 3):
        t.append(spark.range(lo, lo + 3).select(F.col("id").alias("v")))
    t.vacuum(keep_last=2, min_age_seconds=0)
    assert not os.path.exists(t._manifest_path(5))
    t2 = SnapshotTable(spark, p)
    assert _rows(t2.read(version=6)) == list(range(18))
    assert _rows(t2.read()) == list(range(21))
    # and committing on top of the gap still works
    t2.append(spark.range(21, 24).select(F.col("id").alias("v")))
    assert _rows(SnapshotTable(spark, p).read()) == list(range(24))


def test_vacuum_aborts_when_horizon_checkpoint_fails(spark, tmp_path,
                                                     monkeypatch):
    """If the pre-deletion txn fold cannot be written, vacuum must
    delete NOTHING (a gap without folded marks lets append_once
    double-commit a replayed batch)."""
    t = SnapshotTable.create(spark, str(tmp_path / "ab"))
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 6):
        t.append_once(df, txn_id="p", txn_version=i)

    def boom(version):
        raise OSError("disk full")

    monkeypatch.setattr(t, "_write_checkpoint", boom)
    with pytest.warns(VacuumAbortedWarning):   # aborted ≠ nothing-to-do
        removed = t.vacuum(keep_last=2, min_age_seconds=0)
    assert removed == []
    for v in range(6):
        assert os.path.exists(t._manifest_path(v))
    monkeypatch.undo()
    # with the fold healthy again the same vacuum proceeds
    assert t.vacuum(keep_last=2, min_age_seconds=0)
    assert t._last_txn_version("p") == 5
    assert t.append_once(df, txn_id="p", txn_version=5) is None


def test_malformed_checkpoint_pointer_degrades_to_scan(spark, tmp_path):
    """A _last_checkpoint.json holding the wrong TYPE (null / list)
    must fall back to the directory scan, not raise TypeError."""
    t = SnapshotTable.create(spark, str(tmp_path / "mal"),
                             checkpoint_interval=3)
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 5):
        t.append_once(df, txn_id="p", txn_version=i)
    ptr = os.path.join(t._manifests, "_last_checkpoint.json")
    with open(ptr, "w") as fh:
        json.dump({"version": None}, fh)
    ck = t._latest_checkpoint(t.current_version())
    assert ck is not None and ck["version"] == 3
    assert t._last_txn_version("p") == 4


def test_second_vacuum_keeps_load_bearing_base(spark, tmp_path):
    """Checkpoint GC must never delete the base that the oldest
    retained delta manifest resolves from, even when a newer
    checkpoint exists above it and the second vacuum drops nothing."""
    p = str(tmp_path / "v2")
    t = SnapshotTable.create(spark, p, checkpoint_interval=8)
    df = spark.range(1).select(F.col("id").alias("v"))
    for _ in range(7):
        t.append(df)                       # v1..v7
    t.vacuum(keep_last=2, min_age_seconds=0)   # horizon ckpt-5
    t.append(df)                               # v8 → interval ckpt-8
    t.append(df)                               # v9
    assert os.path.exists(t._checkpoint_path(5))
    assert os.path.exists(t._checkpoint_path(8))
    t.vacuum(keep_last=10, min_age_seconds=0)  # drops no manifests
    assert os.path.exists(t._checkpoint_path(5))   # still the v6 base
    t2 = SnapshotTable(spark, p)
    assert t2.read(version=6).count() == 6
    assert t2.read().count() == 9


def test_legacy_full_manifests_interoperate(spark, tmp_path):
    """Pre-r10 tables stored the full file list in every manifest; new
    commits on top must resolve, read and vacuum cleanly."""
    p = str(tmp_path / "leg")
    t = SnapshotTable.create(spark, p)
    for lo in (0, 3):
        t.append(spark.range(lo, lo + 3).select(F.col("id").alias("v")))
    # rewrite the on-disk docs into the legacy full format
    for v in range(3):
        full = dict(t._load_manifest(v))
        for k in ("files_added", "files_removed", "stats_added"):
            full.pop(k, None)
        os.unlink(t._manifest_path(v))
        with open(t._manifest_path(v), "w") as fh:
            json.dump(full, fh)
    t2 = SnapshotTable(spark, p)
    assert _rows(t2.read()) == list(range(6))
    t2.append(spark.range(6, 9).select(F.col("id").alias("v")))
    assert "files" not in _raw(t2, 3)          # new commit is a delta
    assert _rows(SnapshotTable(spark, p).read()) == list(range(9))
    assert _rows(SnapshotTable(spark, p).read(version=2)) \
        == list(range(6))


def test_change_feed_unchanged_by_delta_format(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "cf"))
    t.append(spark.range(3).select(F.col("id").alias("v")))
    t.append(spark.range(3, 5).select(F.col("id").alias("v")))
    ch = t.changes(1, 2)
    assert sorted((r["v"], r["_change_type"]) for r in ch.collect()) \
        == [(3, "insert"), (4, "insert")]


@pytest.mark.parametrize("interval", [2, 10 ** 9])
def test_deep_history_resolves_with_and_without_ckpts(spark, tmp_path,
                                                      interval):
    p = str(tmp_path / f"deep{interval}")
    t = SnapshotTable.create(spark, p, checkpoint_interval=interval)
    df = spark.range(1).select(F.col("id").alias("v"))
    for _ in range(9):
        t.append(df)
    t._mcache.clear()
    assert t._load_manifest(9)["n_files"] == len(
        t._load_manifest(9)["files"])
    assert t.read().count() == 9


def test_vacuum_upgrades_legacy_txn_only_checkpoint(spark, tmp_path):
    """A pre-r10 checkpoint (txn marks, NO file list) sitting exactly
    at the vacuum horizon must be upgraded in place — deleting
    manifests behind a txn-only base would make the retained delta
    chain unresolvable."""
    p = str(tmp_path / "leg")
    t = SnapshotTable.create(spark, p, checkpoint_interval=10 ** 9)
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(1, 8):
        t.append_once(df, txn_id="prod", txn_version=i)   # v1..v7
    # plant a LEGACY txn-only checkpoint at what will be the horizon
    with open(t._checkpoint_path(5), "w") as fh:
        json.dump({"version": 5, "txn": {"prod": 5, "old": 3}}, fh)
    t.vacuum(keep_last=2, min_age_seconds=0)              # horizon = 5
    st = t._ckpt_state(5)
    assert st is not None and len(st["files"]) >= 5       # upgraded
    assert not os.path.exists(t._manifest_path(4))        # vacuum ran
    t2 = SnapshotTable(spark, p)
    assert t2.read().count() == 7                         # chain alive
    assert t2.read(version=6).count() == 6
    # legacy txn marks survive the upgrade (max-merged)
    assert t2._last_txn_version("old") == 3
    assert t2._last_txn_version("prod") == 7


def test_row_count_metadata_only(spark, tmp_path):
    """row_count answers from manifest stats without opening data
    files; falls back to a scan under MoR deletes or missing stats."""
    t = SnapshotTable.create(spark, str(tmp_path / "rc"))
    assert SnapshotTable(spark, t.path).row_count() == 0
    t.append(spark.range(7).select(F.col("id").alias("v")))
    t.append(spark.range(7, 12).select(F.col("id").alias("v")))
    assert t.row_count() == 12
    assert t.row_count(version=1) == 7
    t.delete_where("v >= 10")                       # COW: stats stay
    assert t.row_count() == 10
    t.delete_where("v = 0", mode="mor")             # refs → scan path
    assert t.row_count() == 9
    t.compact()                                     # refs materialized
    m = t._load_manifest(t.current_version())
    assert not m.get("delete_files")
    assert t.row_count() == 9                       # metadata again
    assert t.row_count() == t.read().count()


def test_merge_prunes_by_value_set_not_range(spark, tmp_path):
    """An upsert whose keys hit only the FIRST and LAST clustered files
    must carry every middle file by reference (value-set pruning; the
    old range-only rule rewrote everything between min and max key)."""
    t = SnapshotTable.create(spark, str(tmp_path / "vp"))
    t.append(spark.range(80).select(F.floor(F.col("id") / 10).alias("k"),
                                    F.col("id").alias("v")))
    t.compact(target_files=8, cluster_by=["k"])
    before = t._load_manifest(t.current_version())["files"]
    up = spark.createDataFrame([(0, 1000), (7, 7000)], "k long, v long")
    t.merge(up, keys=["k"])
    after = t._load_manifest(t.current_version())["files"]
    carried = set(before) & set(after)
    assert len(carried) >= 5          # middle files untouched
    got = {r["k"]: r["v"] for r in t.read()
           .groupBy("k").agg(F.max("v").alias("v")).collect()}
    assert got[0] == 1000 and got[7] == 7000 and got[3] == 39
    assert t.read().count() == 80 - 20 + 2


def test_checkpoint_pointer_never_rewinds(spark, tmp_path):
    """vacuum's horizon checkpoint may be OLDER than a periodic
    checkpoint already pointed to; the _last_checkpoint pointer must
    stay on the newer one (rewinding costs every walk O(keep_last)
    manifests until the next periodic write)."""
    t = SnapshotTable.create(spark, str(tmp_path / "mono"),
                             checkpoint_interval=2)
    df = spark.range(1).select(F.col("id").alias("v"))
    for _ in range(6):                      # head v6; ckpts at v2/v4/v6
        t.append(df)
    ptr = os.path.join(t._manifests, "_last_checkpoint.json")
    with open(ptr) as fh:
        assert json.load(fh)["version"] == 6
    # horizon ckpt for keep_last=3 lands at v3 < 6: pointer must hold
    t.vacuum(keep_last=3, min_age_seconds=0)
    with open(ptr) as fh:
        assert json.load(fh)["version"] == 6
    assert os.path.exists(t._checkpoint_path(3))   # fold still written
    assert _rows(t.read()) == [0] * 6


def test_clean_vacuum_emits_no_warning(spark, tmp_path):
    """A successful vacuum (and a nothing-to-do vacuum) must stay
    silent — the warning is the abort signal, not vacuum chatter."""
    import warnings as _w

    t = SnapshotTable.create(spark, str(tmp_path / "quiet"))
    df = spark.range(1).select(F.col("id").alias("v"))
    for _ in range(4):
        t.append(df)
    with _w.catch_warnings():
        _w.simplefilter("error", VacuumAbortedWarning)
        assert t.vacuum(keep_last=2, min_age_seconds=0)
        assert t.vacuum(keep_last=2, min_age_seconds=0) == []


def test_checkpoint_is_segmented_manifest_list(spark, tmp_path):
    """r11 checkpoints carry a manifest-LIST of content-addressed
    segment files, not an embedded file list; _ckpt_state resolves
    them to exactly the manifest's resolved state."""
    t = SnapshotTable.create(spark, str(tmp_path / "seg"),
                             checkpoint_interval=3)
    df = spark.range(2).select(F.col("id").alias("v"))
    for _ in range(3):
        t.append(df)
    with open(t._checkpoint_path(3)) as fh:
        doc = json.load(fh)
    assert "files" not in doc and doc["segments"]
    for name in doc["segments"]:
        assert os.path.exists(t._seg_path(name))
    st = t._ckpt_state(3)
    m = t._load_manifest(3)
    assert st["files"] == m["files"]
    assert st["file_stats"] == m["file_stats"]


def test_unchanged_segments_are_reused_across_checkpoints(spark,
                                                          tmp_path):
    """Content addressing: with many buckets, consecutive checkpoints
    share the segment names whose membership did not change — the
    steady-state checkpoint write is O(changed segments)."""
    t = SnapshotTable.create(spark, str(tmp_path / "reuse"),
                             checkpoint_interval=3)
    t.checkpoint_segment_files = 1      # force many buckets
    df = spark.range(1).select(F.col("id").alias("v"))
    for _ in range(21):                 # ckpts at v18 (18 files) and
        t.append(df)                    # v21 (21 files): both in the
    with open(t._checkpoint_path(18)) as fh:
        d18 = json.load(fh)
    with open(t._checkpoint_path(21)) as fh:
        d21 = json.load(fh)
    s18, s21 = set(d18["segments"]), set(d21["segments"])
    # append-only growth within one power-of-2 bucket regime: only the
    # buckets the new files hash into rewrite; the rest reuse their
    # content-addressed name (a bucket-count change — table doubling —
    # is the amortized-rare full rewrite by design)
    added = d21["n_files"] - d18["n_files"]
    assert len(s18) == len(s21), "bucket regime changed mid-test"
    shared = s18 & s21
    assert len(shared) >= len(s18) - added, \
        f"expected ≥{len(s18) - added} reused segments, got {len(shared)}"
    # resolution still exact at both checkpoints
    assert t._ckpt_state(21)["files"] == t._load_manifest(21)["files"]


def test_reused_segment_mtime_refreshed(spark, tmp_path):
    """ADVICE r12: reusing a content-addressed segment must refresh
    its mtime, so vacuum's min-age GC guard covers the reuse the same
    way it covers a fresh link (an old-mtime segment referenced only
    by a brand-new checkpoint could otherwise be GC'd in the window
    before the checkpoint doc becomes visible)."""
    import os
    import time

    t = SnapshotTable.create(spark, str(tmp_path / "mt"),
                             checkpoint_interval=3)
    t.checkpoint_segment_files = 1      # force many buckets
    df = spark.range(1).select(F.col("id").alias("v"))
    for _ in range(21):                 # 16 < n ≤ 32: stable regime
        t.append(df)                    # for ckpts at 18 and 21
    with open(t._checkpoint_path(18)) as fh:
        d18 = json.load(fh)
    with open(t._checkpoint_path(21)) as fh:
        d21 = json.load(fh)
    shared = sorted(set(d18["segments"]) & set(d21["segments"]))
    assert shared, "fixture must reuse at least one segment"
    # age every shared segment far into the past, then force another
    # checkpoint (24 files — same bucket regime): the reuse path must
    # bump the mtime of whichever aged segments it re-references
    old = time.time() - 9999
    for name in shared:
        os.utime(t._seg_path(name), (old, old))
    for _ in range(3):                  # next ckpt at v24
        t.append(df)
    with open(t._checkpoint_path(24)) as fh:
        d24 = json.load(fh)
    reused = sorted(set(shared) & set(d24["segments"]))
    assert reused, "at least one aged segment must be reused at v24"
    for name in reused:
        assert time.time() - os.path.getmtime(t._seg_path(name)) < 120


def test_legacy_embedded_file_checkpoint_still_resolves(spark,
                                                        tmp_path):
    """An r10 checkpoint embedding `files` directly keeps working as a
    resolve base (mixed-generation directory)."""
    t = SnapshotTable.create(spark, str(tmp_path / "legacy"),
                             checkpoint_interval=3)
    df = spark.range(1).select(F.col("id").alias("v"))
    for _ in range(4):
        t.append(df)
    # rewrite ckpt v3 in the r10 format
    st = t._load_manifest(3)
    with open(t._checkpoint_path(3)) as fh:
        doc = json.load(fh)
    legacy = {"version": 3, "txn": doc.get("txn") or {},
              "files": st["files"],
              "file_stats": st.get("file_stats") or {},
              "committed_at": doc["committed_at"]}
    with open(t._checkpoint_path(3), "w") as fh:
        json.dump(legacy, fh)
    cold = SnapshotTable(spark, str(tmp_path / "legacy"),
                         checkpoint_interval=3)
    assert cold._ckpt_state(3)["files"] == st["files"]
    assert _rows(cold.read()) == [0, 0, 0, 0]


def test_vacuum_gcs_orphaned_segments_keeps_referenced(spark,
                                                       tmp_path):
    """Segment GC drops segments no surviving checkpoint references
    (min-age respected) and never the referenced ones."""
    t = SnapshotTable.create(spark, str(tmp_path / "gc"),
                             checkpoint_interval=2)
    t.checkpoint_segment_files = 1
    df = spark.range(1).select(F.col("id").alias("v"))
    for i in range(8):
        t.merge(spark.range(1).select(
            F.lit(i).cast("long").alias("v")), keys=["v"])
    segs = lambda: {n for n in os.listdir(t._manifests)      # noqa: E731
                    if n.startswith("seg-")}
    before = segs()
    assert before
    # age everything, then vacuum: superseded ckpts drop, their
    # now-orphaned segments drop with them
    for n in before | {"x"}:
        p = os.path.join(t._manifests, n)
        if os.path.exists(p):
            os.utime(p, (1, 1))
    t.vacuum(keep_last=2, min_age_seconds=0)
    after = segs()
    live = set()
    for n in os.listdir(t._manifests):
        if n.startswith("ckpt-v"):
            with open(os.path.join(t._manifests, n)) as fh:
                live.update(json.load(fh).get("segments") or ())
    assert live <= after                 # every referenced seg survives
    assert after == live                 # every orphan was collected
    # the table still reads through its horizon base
    assert SnapshotTable(spark, str(tmp_path / "gc")).read().count() == 8


def test_merge_precondition_aborts_without_publishing(spark, tmp_path):
    """merge(precondition=...) is the Iceberg validate hook: when the
    head moved past the pinned snapshot the commit aborts with None
    and publishes nothing; with the head unchanged it commits."""
    t = SnapshotTable.create(spark, str(tmp_path / "pc"))
    t.append(spark.range(3).select(F.col("id").alias("v")))
    pinned = t.current_version()
    up = spark.range(1, 2).select(F.col("id").alias("v"))
    # head moves: concurrent append
    t.append(spark.range(10, 11).select(F.col("id").alias("v")))
    head = t.current_version()
    assert t.merge(up, keys=["v"],
                   precondition=lambda p: p == pinned) is None
    assert t.current_version() == head          # nothing published
    # unchanged head: commits normally
    v = t.merge(up, keys=["v"],
                precondition=lambda p: p == head)
    assert v == head + 1
    assert sorted(r["v"] for r in t.read().collect()) == [0, 1, 2, 10]
