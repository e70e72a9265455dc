"""Tests for WebDataset tar shard export/import (llmops/export.py, gate e19)."""

import json
import os
import tarfile

from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.export import read_webdataset, write_webdataset


def _corpus(spark, n=40):
    rows = [(i, f"text body {i}", "en" if i % 2 else "de", i * 3) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string, n_chars bigint")


def test_write_read_roundtrip(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df, out, meta_cols=["lang", "n_chars"], n_shards=4
    ).collect()
    assert sum(m.n_samples for m in manifest) == 40
    assert len(os.listdir(out)) == len(manifest)
    back = read_webdataset(spark, out)
    texts = {
        int(r.key): bytes(r.payload).decode()
        for r in back.filter(F.col("ext") == "txt").collect()
    }
    metas = {
        int(r.key): json.loads(bytes(r.payload))
        for r in back.filter(F.col("ext") == "json").collect()
    }
    assert texts == {i: f"text body {i}" for i in range(40)}
    assert metas[7] == {"lang": "en", "n_chars": 21}
    assert metas[8]["lang"] == "de"


def test_shard_bytes_are_deterministic(spark, tmp_path):
    df = _corpus(spark)
    m1 = {
        r.shard_id: r.tar_md5
        for r in write_webdataset(df, str(tmp_path / "a"), n_shards=4).collect()
    }
    m2 = {
        r.shard_id: r.tar_md5
        for r in write_webdataset(
            df.repartition(7), str(tmp_path / "b"), n_shards=4
        ).collect()
    }
    assert m1 == m2  # bit-identical shards across input partitionings
    # byte-level check: the files themselves are identical
    for name in os.listdir(tmp_path / "a"):
        a = (tmp_path / "a" / name).read_bytes()
        b = (tmp_path / "b" / name).read_bytes()
        assert a == b


def test_tar_members_sorted_and_zeroed(spark, tmp_path):
    df = _corpus(spark, n=10)
    write_webdataset(df, str(tmp_path / "w"), meta_cols=["lang"], n_shards=1).collect()
    with tarfile.open(tmp_path / "w" / "shard-00000.tar") as tar:
        members = tar.getmembers()
        keys = [int(m.name.split(".")[0]) for m in members]
        assert keys == sorted(keys)
        assert all(m.mtime == 0 and m.uid == 0 and m.gid == 0 for m in members)
        # sample runs: txt then json per key
        assert [m.name for m in members[:2]] == ["0.txt", "0.json"]


def test_null_meta_int_roundtrips_as_json_int_or_null(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 7), (2, "b", None)], "doc_id bigint, text string, n_chars bigint"
    )
    out = str(tmp_path / "nullmeta")
    write_webdataset(df, out, meta_cols=["n_chars"], n_shards=1).collect()
    back = read_webdataset(spark, out)
    metas = {
        int(r.key): bytes(r.payload).decode()
        for r in back.filter(F.col("ext") == "json").collect()
    }
    # int stays an int (not 7.0), null stays JSON null (not NaN)
    assert json.loads(metas[1]) == {"n_chars": 7}
    assert json.loads(metas[2]) == {"n_chars": None}
    assert "7.0" not in metas[1] and "NaN" not in metas[2]


def test_null_text_raises_loudly(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    with pytest.raises(Exception, match="NULL text"):
        try:
            write_webdataset(df, str(tmp_path / "x"), n_shards=1).collect()
        except Py4JJavaError as e:  # unwrap the executor-side ValueError
            raise RuntimeError(str(e)) from e


def test_non_identifier_meta_column_names(spark, tmp_path):
    df = spark.createDataFrame([(1, "t", 5)], "doc_id bigint, text string, `page-count` bigint")
    out = str(tmp_path / "hyphen")
    write_webdataset(df, out, meta_cols=["page-count"], n_shards=1).collect()
    back = read_webdataset(spark, out)
    meta = json.loads(
        bytes(back.filter(F.col("ext") == "json").collect()[0].payload)
    )
    assert meta == {"page-count": 5}


def test_read_webdataset_groups_back_to_samples(spark, tmp_path):
    df = _corpus(spark, n=12)
    out = str(tmp_path / "w2")
    write_webdataset(df, out, meta_cols=["lang"], n_shards=2).collect()
    back = read_webdataset(spark, out)
    per_key = back.groupBy("key").agg(F.sort_array(F.collect_list("ext")).alias("exts"))
    assert all(r.exts == ["json", "txt"] for r in per_key.collect())
    assert per_key.count() == 12


def test_duplicate_ids_raise_loudly(spark, tmp_path):
    """ADVICE r5: duplicate ids collide on the tar member name and
    silently break WebDataset sample grouping -- fail loudly instead."""
    import pytest

    df = spark.createDataFrame(
        [("a", "t1"), ("a", "t2")], "doc_id string, text string"
    )
    with pytest.raises(Exception, match="duplicate id"):
        write_webdataset(df, str(tmp_path / "dup"), n_shards=1).collect()


def test_slash_in_id_raises_loudly(spark, tmp_path):
    """ids containing '/' would nest paths inside the tar -- reject."""
    import pytest

    df = spark.createDataFrame([("a/b", "t1")], "doc_id string, text string")
    with pytest.raises(Exception, match="contains"):
        write_webdataset(df, str(tmp_path / "slash"), n_shards=1).collect()


def test_assign_byte_shards_prefix_bin_rule(spark):
    """Round 7: shard_id = exclusive_prefix_bytes // target, computed
    the two-level distributed way — equal to a hand prefix sum, and
    the plan must contain NO unpartitioned window."""
    from pyspark.sql import functions as F

    from gfw_data_api_spark.llmops.export import assign_byte_shards

    rows = [(i, "x" * (10 + (i * 7) % 30)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    out = assign_byte_shards(df, target_bytes=300, bucket_width=25)
    got = {r.doc_id: r.shard_id for r in out.collect()}
    # hand prefix sum in id order
    cum = 0
    for i, text in rows:
        assert got[i] == cum // 300, i
        cum += len(text)
    # every window in the plan is partitioned (the operator's reason
    # to exist — a global running sum would be one task at scale)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    import re as _re

    assert not _re.search(r"windowspecdefinition\(\s*doc_id", plan.replace("\n", " "))


def test_assign_byte_shards_validates(spark):
    import pytest

    from gfw_data_api_spark.llmops.export import assign_byte_shards

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="positive"):
        assign_byte_shards(df, target_bytes=0)
