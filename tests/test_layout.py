"""Tests for operators.layout — Z-order keys and z-ordered writes.

The cross-engine key parity is pinned by the ``zorder_locality``
oracle query; these tests pin the curve algebra (bijection, locality)
and the actual 100 TB payoff: parquet file/row-group min/max stats
that prune on BOTH dimensions of a box predicate, measured with
pyarrow against a single-column-sorted control layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flycatcher_spark.operators import layout
from flycatcher_spark.operators.layout import ZDim


@pytest.fixture(scope="module")
def grid(spark):
    # full 32x32 integer grid: every (x, y) once
    return spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )


DIMS = [ZDim("x", 0, 31), ZDim("y", 0, 31)]


class TestKey:
    def test_bijection_on_grid(self, grid):
        zs = [r["z"] for r in grid.select(
            layout.zorder_key(DIMS, bits=5).alias("z")).collect()]
        assert sorted(zs) == list(range(1024))

    def test_interleave_positions(self, spark):
        # dimension j contributes bit b at position b*k + j
        df = spark.createDataFrame([(1, 0), (0, 1), (2, 0), (0, 2), (31, 31)],
                                   "x long, y long")
        out = {(r["x"], r["y"]): r["z"] for r in df.select(
            "x", "y", layout.zorder_key(DIMS, bits=5).alias("z")).collect()}
        assert out[(1, 0)] == 0b01
        assert out[(0, 1)] == 0b10
        assert out[(2, 0)] == 0b0100
        assert out[(0, 2)] == 0b1000
        assert out[(31, 31)] == 1023

    def test_out_of_domain_clamps(self, spark):
        df = spark.createDataFrame([(-5, 99)], "x long, y long")
        z = df.select(layout.zorder_key(DIMS, bits=5).alias("z")).collect()[0]["z"]
        # clamps to (0, 31) -> y bits all set, x bits clear
        assert z == 0b1010101010

    def test_locality_buckets_are_rectangles(self, grid):
        # top 4 prefix bits split the 32x32 grid into 16 z-cells;
        # each is a contiguous 8x8 rectangle: span product == count
        spans = layout.zorder_spans(grid, DIMS, bits=5, prefix_bits=4).collect()
        assert len(spans) == 16
        for r in spans:
            assert r["n"] == 64
            assert (r["d0_max"] - r["d0_min"] + 1) == 8
            assert (r["d1_max"] - r["d1_min"] + 1) == 8

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="at least 2"):
            layout.zorder_expr([ZDim("x", 0, 1)])
        with pytest.raises(ValueError, match="exceeds int64"):
            layout.zorder_expr([ZDim("x", 0, 1)] * 4, bits=16)
        with pytest.raises(ValueError, match="hi > lo"):
            layout.zorder_expr([ZDim("x", 5, 5), ZDim("y", 0, 1)])
        with pytest.raises(ValueError, match="dialect"):
            layout.zorder_expr(DIMS, dialect="postgres")


def _file_spans(path, cols):
    """Per-parquet-file (min, max) of each column from footer stats —
    exactly what a scan's file-level skipping sees."""
    import pyarrow.parquet as pq
    import pathlib

    spans = []
    for f in pathlib.Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        spans.append({c: (lo[c], hi[c]) for c in cols})
    return spans


def _surviving(spans, box):
    return sum(
        1 for s in spans
        if all(s[c][0] <= hi and s[c][1] >= lo for c, (lo, hi) in box.items())
    )


class TestWrite:
    def test_zorder_write_prunes_both_dims(self, spark, tmp_path):
        # 4096 rows over a 64x64 grid; control: sorted by x only
        df = spark.createDataFrame(
            [(x, y, x * 64 + y) for x in range(64) for y in range(64)],
            "x long, y long, payload long",
        )
        dims = [ZDim("x", 0, 63), ZDim("y", 0, 63)]
        zpath, cpath = str(tmp_path / "z"), str(tmp_path / "c")
        layout.write_zorder(df, zpath, dims, bits=6, n_files=16)
        (df.repartitionByRange(16, "x").sortWithinPartitions("x")
           .write.mode("overwrite").parquet(cpath))

        zs = _file_spans(zpath, ["x", "y"])
        cs = _file_spans(cpath, ["x", "y"])
        assert len(zs) == 16 and len(cs) >= 8
        # box predicate selective on BOTH dims: an eighth of each axis
        box = {"x": (8, 15), "y": (8, 15)}
        z_hit, c_hit = _surviving(zs, box), _surviving(cs, box)
        # x-sorted layout prunes on x but every surviving file spans
        # all of y; z-order prunes on both -> strictly fewer files
        assert z_hit < c_hit
        assert z_hit <= len(zs) // 4

        # layout must not change content
        back = spark.read.parquet(zpath)
        assert back.count() == 4096
        assert back.agg(F.sum("payload")).collect()[0][0] == sum(range(4096))

    def test_written_files_are_key_sorted(self, spark, tmp_path):
        # within every file the Morton key is nondecreasing (row-group
        # stats tightness depends on it)
        import pyarrow.parquet as pq
        import pathlib

        df = spark.createDataFrame(
            [(x, y) for x in range(32) for y in range(32)], "x long, y long"
        )
        dims = [ZDim("x", 0, 31), ZDim("y", 0, 31)]
        path = str(tmp_path / "sorted")
        layout.write_zorder(df, path, dims, bits=5, n_files=4)
        dexpr = layout.zorder_expr(dims, bits=5, dialect="duckdb")
        import duckdb

        con = duckdb.connect()
        for f in pathlib.Path(path).glob("*.parquet"):
            rows = con.sql(
                f"SELECT {dexpr} AS z FROM read_parquet('{f}')"
            ).fetchall()
            zs = [r[0] for r in rows]
            assert zs == sorted(zs)
