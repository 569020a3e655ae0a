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
