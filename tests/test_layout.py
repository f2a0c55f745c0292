from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators.layout import (
    write_zordered,
    zorder_value,
)


def _py_morton(a, b, bits=16):
    m = (1 << bits) - 1
    a &= m
    b &= m
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (123456, 7)]
    df = spark.createDataFrame(rows, "a bigint, b bigint").select(
        "a", "b", zorder_value(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.zval == _py_morton(r.a, r.b), (r.a, r.b)


def test_zorder_locality_property(spark):
    # points close in both dims must be closer in z than points far in one
    df = spark.createDataFrame(
        [(10, 10), (11, 11), (10, 1000)], "a bigint, b bigint"
    ).select(zorder_value(F.col("a"), F.col("b")))
    z = [r.zval for r in df.collect()]
    assert abs(z[0] - z[1]) < abs(z[0] - z[2])


def test_write_zordered_prunes_on_both_dims(spark, tmp_path):
    """Every output file covers a compact z-rectangle: for a box
    predicate on (a, b), most files' (min, max) stats exclude it."""
    import pyarrow.parquet as pq
    import glob

    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 140).alias("a"), ((F.col("id") * 7) % 140).alias("b")
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, "a", "b", n_files=16, bits=8)
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 8
    # a in [0,20] AND b in [0,20]: count files whose min-max could match
    overlapping = 0
    for f in files:
        md = pq.read_metadata(f)
        amin = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        amax = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        bmin = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        bmax = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        if amin <= 20 and amax >= 0 and bmin <= 20 and bmax >= 0:
            overlapping += 1
    # without clustering every file overlaps; z-order confines the box
    assert overlapping < len(files) / 2, (overlapping, len(files))
    # correctness: the rewrite loses no rows
    assert spark.read.parquet(path).count() == n
