"""Z-order layout verification: the file-skipping win is MEASURED from the
written files' min/max footprints (the stats engines actually skip on),
not asserted from theory — and the layout never changes query results."""

from __future__ import annotations

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from log_analysis_spark.sources import layout


@pytest.fixture(scope="module")
def uniform(spark):
    # 60k points, both dims uniform — the normalization's home turf
    return spark.range(60000).select(
        F.abs(F.xxhash64(F.col("id")) % 1000).alias("user_id"),
        (F.abs(F.xxhash64(F.col("id") + 7) % 100000) / 100.0).alias("value"),
    )


def _boxes(d):
    out = []
    for f in sorted(glob.glob(f"{d}/*.parquet")):
        r = duckdb.sql(
            f"select min(user_id), max(user_id), min(value), max(value), count(*) from '{f}'"
        ).fetchone()
        if r[4]:
            out.append(r[:4])
    return out

def _touched(bs, u1, u2, v1, v2):
    return sum(
        1 for (ul, uh, vl, vh) in bs if not (uh < u1 or ul > u2 or vh < v1 or vl > v2)
    )


def test_zorder_skips_files_single_clustering_cannot(spark, uniform, tmp_path):
    z_dir, c_dir = str(tmp_path / "z"), str(tmp_path / "c")
    layout.write_zordered(uniform, z_dir, ["user_id", "value"], n_files=64)
    layout.write_range_clustered(uniform, c_dir, "user_id", n_files=64)
    zb, cb = _boxes(z_dir), _boxes(c_dir)
    assert len(zb) > 32 and len(cb) > 32
    # 2D box predicates on BOTH dims: z-order's per-file hyper-rectangles
    # prune where u-only clustering reads every matching-u file
    for box in [(0, 124, 0, 124.99), (500, 624, 500, 624.99), (0, 249, 0, 249.99)]:
        zt, ct = _touched(zb, *box), _touched(cb, *box)
        assert zt >= 1
        assert zt * 2 <= ct, f"box {box}: z touched {zt}, control {ct}"
    # results are identical regardless of layout
    q = (F.col("user_id").between(0, 124)) & (F.col("value").between(0, 124.99))
    a = sorted(map(tuple, spark.read.parquet(z_dir).filter(q).collect()))
    b = sorted(map(tuple, spark.read.parquet(c_dir).filter(q).collect()))
    assert a == b and len(a) > 0


def test_zorder_validation(spark, uniform, tmp_path):
    with pytest.raises(ValueError):
        layout.write_zordered(uniform, str(tmp_path / "x"), ["user_id"])


@pytest.fixture(scope="module")
def heavy_tail(spark):
    # value = u^8 · 1e9: bulk crammed near zero, max ~1e9 — min-max
    # normalization's failure mode; deterministic via xxhash
    return spark.range(60000).select(
        F.abs(F.xxhash64("id") % 1000).alias("user_id"),
        (
            F.pow(F.abs(F.xxhash64(F.col("id") + 3) % 100000) / 100000.0, 8)
            * 1e9
        ).alias("value"),
    )


def test_zorder_rank_normalization_beats_minmax_on_heavy_tail(
    spark, heavy_tail, tmp_path
):
    z_dir = str(tmp_path / "zr")
    mm_dir = str(tmp_path / "mm")
    c_dir = str(tmp_path / "c")
    layout.write_zordered_ranked(
        heavy_tail, z_dir, ["user_id", "value"], n_files=64,
        resolution={"user_id": 1.0, "value": 1000.0},
    )
    layout.write_zordered(heavy_tail, mm_dir, ["user_id", "value"], n_files=64)
    layout.write_range_clustered(heavy_tail, c_dir, "user_id", n_files=64)
    zb, mb, cb = _boxes(z_dir), _boxes(mm_dir), _boxes(c_dir)
    # quantile-space boxes over the BULK (where min-max squashes the grid):
    # first 1/8 of users × the bottom / second value quartile
    p25 = 2.38e4  # (0.25)^8 * 1e9, within grid slack
    p50 = 3.9e6
    for lo, hi in [(0.0, p25), (p25, p50)]:
        zt = _touched(zb, 0, 124, lo, hi)
        mt = _touched(mb, 0, 124, lo, hi)
        ct = _touched(cb, 0, 124, lo, hi)
        assert zt <= mt <= ct, (zt, mt, ct)
        assert zt < ct, (zt, ct)
    # identical query results across all three layouts
    q = (F.col("user_id").between(0, 124)) & (F.col("value") <= p25)
    res = [
        sorted(map(tuple, spark.read.parquet(d).filter(q).collect()))
        for d in (z_dir, mm_dir, c_dir)
    ]
    assert res[0] == res[1] == res[2] and len(res[0]) > 0


def test_zorder_ranked_requires_per_column_resolution(spark, heavy_tail, tmp_path):
    with pytest.raises(ValueError, match="no resolution for columns"):
        layout.write_zordered_ranked(
            heavy_tail, str(tmp_path / "x"), ["user_id", "value"],
            resolution={"user_id": 1.0},
        )
