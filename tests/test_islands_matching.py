"""interval_islands (gaps-and-islands merge via cumulative max) and
mutual_best_matches (1:1 link resolution by mutual nearest neighbor):
hand-built island topologies including the long-interval-swallows case,
tolerance-adjacency, NULL contracts, matching chains where greedy and
mutual-best diverge, and the one-exchange plan shapes."""

import pytest
from pyspark.sql import functions as F

from evalidate_spark.functions.dedup import mutual_best_matches
from evalidate_spark.operators.asof import interval_islands


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k long, s long, e long")


class TestIntervalIslands:
    def test_merge_overlap_and_gap(self, spark):
        out = sorted(
            interval_islands(
                _iv(spark, [(1, 0, 10), (1, 5, 20), (1, 30, 40),
                            (2, 0, 5)]),
                ["k"], "s", "e",
            ).collect(),
            key=lambda r: (r.k, r.island_ix),
        )
        assert [(r.k, r.island_ix, r.island_start, r.island_end,
                 r.n_intervals) for r in out] == [
            (1, 1, 0, 20, 2), (1, 2, 30, 40, 1), (2, 1, 0, 5, 1)]

    def test_long_interval_swallows_later_short(self, spark):
        # [0,100] then [10,20] then [30,40]: cumulative max keeps 100 as
        # the frontier, so everything is ONE island (a naive lag(end)
        # comparison would wrongly split at 30 > 20)
        out = interval_islands(
            _iv(spark, [(1, 0, 100), (1, 10, 20), (1, 30, 40)]),
            ["k"], "s", "e",
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.island_start, r.island_end, r.n_intervals) == (0, 100, 3)

    def test_touching_endpoints_merge_closed(self, spark):
        # closed intervals: [0,10] and [10,20] share the point 10 -> merge
        out = interval_islands(
            _iv(spark, [(1, 0, 10), (1, 10, 20)]), ["k"], "s", "e"
        ).collect()
        assert len(out) == 1 and out[0].island_end == 20

    def test_tolerance_bridges_gaps(self, spark):
        rows = [(1, 0, 10), (1, 13, 20)]  # gap of 3
        assert len(interval_islands(
            _iv(spark, rows), ["k"], "s", "e", tolerance=0).collect()) == 2
        assert len(interval_islands(
            _iv(spark, rows), ["k"], "s", "e", tolerance=3).collect()) == 1

    def test_null_bounds_dropped_null_key_groups(self, spark):
        out = interval_islands(
            _iv(spark, [(1, 0, 10), (1, None, 5), (1, 5, None),
                        (None, 0, 10)]),
            ["k"], "s", "e",
        ).collect()
        assert sorted(((r.k if r.k is not None else -1), r.n_intervals)
                      for r in out) == [(-1, 1), (1, 1)]

    def test_contracts(self, spark):
        df = _iv(spark, [(1, 0, 10)])
        with pytest.raises(ValueError, match="key_cols"):
            interval_islands(df, [], "s", "e")
        with pytest.raises(ValueError, match="tolerance"):
            interval_islands(df, ["k"], "s", "e", tolerance=-1)

    def test_single_exchange_plan(self, spark):
        plan = (
            interval_islands(_iv(spark, [(1, 0, 10)]), ["k"], "s", "e")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long, dist long")


class TestMutualBestMatches:
    def test_simple_mutual_pair(self, spark):
        out = mutual_best_matches(_pairs(spark, [(1, 2, 1)])).collect()
        assert [(r.id_a, r.id_b, r.dist) for r in out] == [(1, 2, 1)]

    def test_chain_keeps_only_mutual(self, spark):
        # chain 1-2 (dist 1), 2-3 (dist 2): 2's best is 1, 3's best is 2
        # but 2 prefers 1 -> only (1,2) survives; 3 stays unmatched
        out = mutual_best_matches(
            _pairs(spark, [(1, 2, 1), (2, 3, 2)])).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]

    def test_tie_broken_by_neighbor_id(self, spark):
        # 1 is equidistant to 2 and 3: tie-break picks 2; 2's best is 1
        # -> (1,2); 3's best is 1 but 1 chose 2 -> 3 unmatched
        out = mutual_best_matches(
            _pairs(spark, [(1, 2, 5), (1, 3, 5)])).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]

    def test_each_id_at_most_once(self, spark):
        # two disjoint clusters resolve independently
        out = mutual_best_matches(_pairs(spark, [
            (1, 2, 1), (1, 3, 9), (2, 3, 9), (4, 5, 2), (3, 4, 8),
        ])).collect()
        got = sorted((r.id_a, r.id_b) for r in out)
        assert got == [(1, 2), (4, 5)]
        ids = [i for p in got for i in p]
        assert len(ids) == len(set(ids))

    def test_null_rows_dropped(self, spark):
        out = mutual_best_matches(_pairs(spark, [
            (1, 2, 1), (None, 3, 1), (4, None, 1), (5, 6, None),
        ])).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]

    def test_best_map_is_one_row_per_id(self, spark):
        # plan shape: the rank window runs once over the symmetrized
        # edges; the mutual join joins two WindowGroupLimit-pruned sides
        plan = (
            mutual_best_matches(_pairs(spark, [(1, 2, 1), (2, 3, 2)]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan  # partial top-1 pushed down


from evalidate_spark.operators.asof import interval_overlap_join


def _iv2(spark, rows, idname):
    return spark.createDataFrame(
        rows, "k long, %s long, s long, e long" % idname)


class TestIntervalOverlapJoin:
    def _join(self, spark, lrows, rrows, bucket_s=1):
        return interval_overlap_join(
            _iv2(spark, lrows, "ida"), _iv2(spark, rrows, "idb"),
            on="k", left_id="ida", right_id="idb",
            left_start="s", left_end="e", right_start="s", right_end="e",
            bucket_s=bucket_s,
        )

    def test_overlap_bounds_and_touch(self, spark):
        # ida 1 [0,10] overlaps idb 1 [5,20] on [5,10]; idb 2 [10,12]
        # touches at the single instant 10 (closed -> overlap_us 0);
        # idb 3 [11,15] misses entirely
        out = sorted(
            self._join(
                spark,
                [(1, 1, 0, 10_000_000)],
                [(1, 1, 5_000_000, 20_000_000),
                 (1, 2, 10_000_000, 12_000_000),
                 (1, 3, 11_000_000, 15_000_000)],
            ).collect(),
            key=lambda r: r.idb,
        )
        assert [(r.idb, r.overlap_start, r.overlap_end, r.overlap_us)
                for r in out] == [
            (1, 5_000_000, 10_000_000, 5_000_000),
            (2, 10_000_000, 10_000_000, 0),
        ]

    def test_key_isolation(self, spark):
        out = self._join(
            spark, [(1, 1, 0, 10_000_000)], [(2, 9, 0, 10_000_000)]
        ).collect()
        assert out == []

    def test_multi_cell_pair_emitted_once(self, spark):
        # both spans cover many 1s grid cells -> candidate dedupe
        out = self._join(
            spark, [(1, 1, 0, 9_000_000)], [(1, 7, 0, 9_000_000)]
        ).collect()
        assert len(out) == 1 and out[0].overlap_us == 9_000_000

    def test_malformed_and_null_dropped(self, spark):
        out = self._join(
            spark,
            [(1, 1, 10_000_000, 0),          # reversed
             (None, 2, 0, 10_000_000),       # NULL key
             (1, None, 0, 10_000_000),       # NULL id
             (1, 3, None, 10_000_000),       # NULL start
             (1, 4, 0, 10_000_000)],
            [(1, 9, 0, 10_000_000)],
        ).collect()
        assert [(r.ida, r.idb) for r in out] == [(4, 9)]

    def test_contract(self, spark):
        with pytest.raises(ValueError, match="bucket_s"):
            self._join(spark, [(1, 1, 0, 1)], [(1, 2, 0, 1)], bucket_s=0)

    def test_no_cross_join_in_plan(self, spark):
        plan = (
            self._join(spark, [(1, 1, 0, 1_000_000)],
                       [(1, 2, 0, 1_000_000)], bucket_s=3600)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "hashpartitioning" in plan or "BroadcastHashJoin" in plan
