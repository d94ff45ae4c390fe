"""SnapshotLog: append/overwrite chains resolve to the right immutable
file sets, time-travel reads are repeatable after later commits, crash
mid-write never publishes, and error contracts hold."""

import os

import pytest

from pyspark.sql import functions as F

from evalidate_spark.sources import SnapshotLog


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").cast("long").alias("v"))


def test_append_chain_and_time_travel(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    s1 = log.commit(_df(spark, 0, 10))
    s2 = log.commit(_df(spark, 10, 15))
    assert (s1, s2) == (1, 2)
    assert log.read(spark, s1).count() == 10          # time travel
    assert log.read(spark).count() == 15              # latest = union
    assert sorted(r["v"] for r in log.read(spark, s2).collect()) == list(range(15))


def test_overwrite_resets_lineage(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit(_df(spark, 0, 10))
    s2 = log.commit(_df(spark, 100, 103), operation="overwrite")
    log.commit(_df(spark, 200, 202))                  # append on top
    assert sorted(r["v"] for r in log.read(spark).collect()) == [100, 101, 102, 200, 201]
    assert log.read(spark, s2).count() == 3
    # snapshot 1 still readable — overwrite never deletes published files
    assert log.read(spark, 1).count() == 10


def test_resolved_snapshot_is_immutable_under_later_commits(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    s1 = log.commit(_df(spark, 0, 5))
    before = log.files(s1)
    log.commit(_df(spark, 5, 9))
    assert log.files(s1) == before


def test_unpublished_data_is_invisible(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit(_df(spark, 0, 5))
    # simulate a crash AFTER data write, BEFORE manifest publish: write
    # a stray data dir with no manifest
    stray = str(tmp_path / "t" / "data" / "snap-00099")
    _df(spark, 900, 905).write.parquet(stray)
    assert log.latest_id() == 1
    assert log.read(spark).count() == 5


def test_errors(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="no snapshots"):
        log.read(spark)
    log.commit(_df(spark, 0, 3))
    with pytest.raises(ValueError, match="unknown snapshot"):
        log.read(spark, 42)
    with pytest.raises(ValueError, match="append.overwrite"):
        log.commit(_df(spark, 0, 1), operation="merge")


def test_read_table_routes_snapshot_logged_paths(spark, tmp_path):
    from evalidate_spark.sources import read_table

    path = str(tmp_path / "t")
    log = SnapshotLog(path)
    s1 = log.commit(_df(spark, 0, 4))
    log.commit(_df(spark, 4, 6))
    assert read_table(spark, path).count() == 6
    assert read_table(spark, path, snapshot_id=s1).count() == 4
    # bare parquet path + snapshot_id still refuses
    bare = str(tmp_path / "bare")
    _df(spark, 0, 3).write.parquet(bare)
    with pytest.raises(ValueError, match="SnapshotLog"):
        read_table(spark, bare, snapshot_id=1)


def test_commit_recovers_from_orphaned_data_dir(spark, tmp_path):
    """Review regression: a crash AFTER the data write, BEFORE manifest
    publish leaves data/snap-<next> orphaned — the next commit must
    replace it, not wedge on PATH_ALREADY_EXISTS forever."""
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit(_df(spark, 0, 5))
    orphan = str(tmp_path / "t" / "data" / "snap-00002")
    _df(spark, 900, 909).write.parquet(orphan)  # the crashed write
    s2 = log.commit(_df(spark, 5, 8))           # must succeed
    assert s2 == 2
    assert sorted(r["v"] for r in log.read(spark).collect()) == list(range(8))


def test_checkpointed_run_units_are_snapshots(spark, tmp_path):
    """A snapshot-logged input validates one unit per ingest commit, and
    a commit landing mid-run is picked up by resume without re-running
    published snapshots."""
    from evalidate_spark.checkpoint import CheckpointedRun, list_units
    from evalidate_spark.spec import Rule, Size

    src = str(tmp_path / "in")
    log = SnapshotLog(src)
    for lo, hi in ((0, 40), (40, 70)):
        log.commit(
            spark.range(lo, hi).selectExpr(
                "concat('d', id) doc_id",
                "case when id % 9 = 0 then 'no' else 'valid text' end text",
            )
        )
    rules = [Rule(key="doc_id"), Rule(key="text", validators=[Size(5, 100)])]
    run = CheckpointedRun(spark, src, rules, str(tmp_path / "out"))
    assert [u["unit_id"] for u in list_units(src)] == ["snap-00001", "snap-00002"]
    first = run.run()
    assert first["processed_now"] == ["snap-00001", "snap-00002"]
    assert first["rows"] == 70

    # a third ingest lands later: only IT is pending
    log.commit(
        spark.range(70, 80).selectExpr(
            "concat('d', id) doc_id", "'valid text' text"
        )
    )
    second = run.run()
    assert second["processed_now"] == ["snap-00003"]
    assert second["rows"] == 80
    # violations: ids 0,9,...,63 fail Size(5,100) with 'no'
    assert run.violations().select("doc_id").distinct().count() == len(
        [i for i in range(70) if i % 9 == 0]
    )


def test_compact_rewrites_state_and_keeps_history(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        log.commit(_df(spark, lo, hi).repartition(4))
    assert len(log.files()) == 12
    sid = log.compact(spark, target_files=2)
    assert len(log.files()) <= 2
    assert sorted(r["v"] for r in log.read(spark).collect()) == list(range(90))
    # pre-compaction snapshots still time-travel
    assert log.read(spark, 2).count() == 60
    # appends on top of the compacted state chain correctly
    log.commit(_df(spark, 90, 95))
    assert log.read(spark).count() == 95
    assert sid == 4


def test_compaction_snapshot_is_not_a_checkpoint_unit(spark, tmp_path):
    """Review regression: compact() rewrites already-validated rows — a
    checkpointed run must NOT re-validate them as a fresh increment
    (rows/violations would double)."""
    from evalidate_spark.checkpoint import CheckpointedRun, list_units
    from evalidate_spark.spec import Rule, Size

    src = str(tmp_path / "in")
    log = SnapshotLog(src)
    log.commit(
        spark.range(0, 50).selectExpr(
            "concat('d', id) doc_id",
            "case when id % 9 = 0 then 'no' else 'valid text' end text",
        )
    )
    rules = [Rule(key="doc_id"), Rule(key="text", validators=[Size(5, 100)])]
    run = CheckpointedRun(spark, src, rules, str(tmp_path / "out"))
    assert run.run()["rows"] == 50
    log.compact(spark)
    after = run.run()
    assert after["processed_now"] == []        # nothing to re-validate
    assert after["rows"] == 50                 # not doubled
    # a genuine overwrite (new data) DOES validate as a unit
    log.commit(
        spark.range(100, 120).selectExpr(
            "concat('d', id) doc_id", "'valid text' text"
        ),
        operation="overwrite",
    )
    assert [u["unit_id"] for u in run.pending_units()] == ["snap-00003"]


def test_stray_snapshots_dir_does_not_hijack_parquet_input(spark, tmp_path):
    """Review regression: a plain parquet input containing an unrelated
    (or empty-skeleton) 'snapshots' folder must still list parquet
    units — not silently validate nothing."""
    from evalidate_spark.checkpoint import list_units
    from evalidate_spark.sources import read_table

    src = str(tmp_path / "in")
    _df(spark, 0, 20).repartition(2).write.parquet(src)
    os.makedirs(os.path.join(src, "snapshots"))   # empty skeleton
    units = list_units(src)
    assert units and all(u["files"] for u in units)
    assert read_table(spark, src).count() == 20


def test_schema_drift_between_snapshots(spark, tmp_path):
    """added / removed / type_changed rows between two snapshot schemas;
    unchanged columns emit nothing; same-snapshot diff is empty."""
    from evalidate_spark.sources import SnapshotLog, schema_drift

    log = SnapshotLog(str(tmp_path / "sd"))
    s1 = log.commit(
        spark.createDataFrame([(1, "x", 0.5)], "a int, b string, d double"),
        operation="overwrite",
    )
    s2 = log.commit(
        spark.createDataFrame([(2, "y", 9)], "a bigint, c string, d long"),
        operation="overwrite",
    )
    got = {
        r["column"]: (r["change"], r["from_type"], r["to_type"])
        for r in schema_drift(spark, log, s1, s2).collect()
    }
    assert got == {
        "a": ("type_changed", "int", "bigint"),
        "b": ("removed", "string", None),
        "c": ("added", None, "string"),
        "d": ("type_changed", "double", "bigint"),
    }
    assert schema_drift(spark, log, s2, s2).count() == 0
    # default to_snapshot = latest
    assert schema_drift(spark, log, s1).count() == 4


class TestExpire:
    def _chain(self, spark, tmp_path):
        log = SnapshotLog(str(tmp_path / "t"))
        log.commit(_df(spark, 0, 10))                          # 1
        log.commit(_df(spark, 10, 15))                         # 2
        log.commit(_df(spark, 100, 103), operation="overwrite")  # 3
        log.commit(_df(spark, 200, 202))                       # 4
        log.commit(_df(spark, 300, 301))                       # 5
        return log

    def test_retained_reads_identical_after_expiry(self, spark, tmp_path):
        log = self._chain(spark, tmp_path)
        want_5 = sorted(r["v"] for r in log.read(spark, 5).collect())
        want_4 = sorted(r["v"] for r in log.read(spark, 4).collect())
        res = log.expire(keep_last=2)
        assert res["expired_snapshots"] == [1, 2, 3]
        assert res["boundary"] == 4
        assert sorted(r["v"] for r in log.read(spark, 5).collect()) == want_5
        assert sorted(r["v"] for r in log.read(spark, 4).collect()) == want_4
        # latest still resolves by default
        assert sorted(r["v"] for r in log.read(spark).collect()) == want_5

    def test_expired_ids_unreachable_and_files_deleted(self, spark, tmp_path):
        log = self._chain(spark, tmp_path)
        dead = [f for s in log.snapshots()[:2] for f in s["files"]]  # 1, 2
        live_via_boundary = log.files(4)
        log.expire(keep_last=2)
        with pytest.raises(ValueError, match="unknown snapshot"):
            log.files(1)
        for f in dead:
            assert not os.path.exists(f), f
        for f in live_via_boundary:
            assert os.path.exists(f), f

    def test_boundary_flattened_self_contained(self, spark, tmp_path):
        log = self._chain(spark, tmp_path)
        resolved_before = log.files(4)
        log.expire(keep_last=2)
        b = [s for s in log.snapshots() if s["snapshot_id"] == 4][0]
        assert b["operation"] == "overwrite" and b["parent"] is None
        assert b["files"] == resolved_before

    def test_noop_and_idempotent(self, spark, tmp_path):
        log = self._chain(spark, tmp_path)
        assert log.expire(keep_last=10) == {
            "expired_snapshots": [], "deleted_files": 0, "boundary": 5}
        log.expire(keep_last=2)
        again = log.expire(keep_last=2)
        assert again["expired_snapshots"] == [] and again["deleted_files"] == 0
        assert log.read(spark).count() == 6  # 3 + 2 + 1 rows

    def test_appends_continue_after_expiry(self, spark, tmp_path):
        log = self._chain(spark, tmp_path)
        log.expire(keep_last=1)
        s6 = log.commit(_df(spark, 400, 402))
        assert s6 == 6
        assert sorted(r["v"] for r in log.read(spark).collect()) == [
            100, 101, 102, 200, 201, 300, 400, 401]

    def test_keep_last_validation(self, spark, tmp_path):
        log = SnapshotLog(str(tmp_path / "t"))
        with pytest.raises(ValueError, match="keep_last"):
            log.expire(keep_last=0)

    def test_shared_files_survive_when_expired_snapshot_references_them(
        self, spark, tmp_path
    ):
        # an expired APPEND's files live on inside the boundary's
        # flattened list — expiry must never delete a file the retained
        # resolution still names
        log = SnapshotLog(str(tmp_path / "t"))
        log.commit(_df(spark, 0, 10))      # 1 — referenced by 2's chain
        log.commit(_df(spark, 10, 12))     # 2 (boundary after expire)
        log.commit(_df(spark, 20, 21))     # 3
        shared = log.snapshots()[0]["files"]
        log.expire(keep_last=2)
        for f in shared:
            assert os.path.exists(f), f
        assert sorted(r["v"] for r in log.read(spark, 2).collect()) == list(
            range(12))
