"""Z-order layout tests: the multi-dimensional data-skipping claim is
measured from real parquet footers, not asserted rhetorically."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.sources.layout import write_zordered, zorder_key


def _file_spans(path, cols):
    """Per parquet file: {col: (min, max)} aggregated over row groups."""
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        if meta.num_rows == 0:
            continue
        per_col = {}
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    cur = per_col.get(name)
                    per_col[name] = (
                        min(lo, cur[0]) if cur else lo,
                        max(hi, cur[1]) if cur else hi,
                    )
        spans.append(per_col)
    return spans


def _files_scanned(spans, predicate_box):
    n = 0
    for per_col in spans:
        hit = True
        for col, (qlo, qhi) in predicate_box.items():
            lo, hi = per_col[col]
            if hi < qlo or lo > qhi:
                hit = False
                break
        if hit:
            n += 1
    return n


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    df = spark.range(0, 200_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).alias("b"),
        F.col("id").alias("payload"),
    )
    linear = str(base / "linear")
    zord = str(base / "zord")
    # 1-D clustering baseline: range-sorted by a only
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(linear)
    write_zordered(df, zord, ["a", "b"], num_files=16)
    return linear, zord


def test_zorder_skips_on_nonleading_dimension(layouts):
    linear, zord = layouts
    lin = _file_spans(linear, {"a", "b"})
    z = _file_spans(zord, {"a", "b"})
    assert len(lin) >= 8 and len(z) >= 8
    # predicate on b only: 1-D layout scans every file, z-order prunes
    box = {"b": (0, 99)}
    lin_scanned = _files_scanned(lin, box)
    z_scanned = _files_scanned(z, box)
    assert lin_scanned == len(lin)
    assert z_scanned <= len(z) // 2
    # combined 2-D box: z-order is never worse
    box2 = {"a": (0, 99), "b": (0, 99)}
    assert _files_scanned(z, box2) <= _files_scanned(lin, box2)


def test_zorder_key_is_deterministic_native(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
    )
    k1 = df.select(zorder_key(df, ["a", "b"]).alias("z")).collect()
    k2 = df.select(zorder_key(df, ["a", "b"]).alias("z")).collect()
    assert [r["z"] for r in k1] == [r["z"] for r in k2]
    assert all(r["z"] >= 0 for r in k1)


def test_zorder_string_dimension(spark, tmp_path):
    df = spark.range(0, 5000).select(
        F.concat(F.lit("cat_"), (F.col("id") % 50).cast("string")).alias("cat"),
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "zs")
    write_zordered(df, out, ["cat", "v"], num_files=4)
    back = df.sparkSession.read.parquet(out)
    assert back.count() == 5000
    assert set(back.columns) == {"cat", "v"}


def test_zorder_validates_args(spark):
    df = spark.range(10).select(F.col("id").alias("a"))
    with pytest.raises(ValueError):
        zorder_key(df, [])
    with pytest.raises(ValueError):
        zorder_key(df, ["a"], bits_per_dim=63)
