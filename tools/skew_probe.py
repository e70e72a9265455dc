#!/usr/bin/env python
"""Empirical skew probe: do the skew operators beat the naive plans on
a hot-key distribution?

Synthesizes a fact table where ONE key holds ~50% of all rows (the
pathology AQE's post-shuffle splitting mitigates but still shuffles),
then times naive groupBy vs salted_groupby and naive join vs
skew_hybrid_join. Results recorded in docs/SCALE.md.

Usage: python tools/skew_probe.py [rows_millions] (default 8).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gfw_data_api_spark.operators.skew import salted_groupby, skew_hybrid_join
from gfw_data_api_spark.session import get_spark


def timed(fn, warm=1, runs=3):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(runs):
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = n * 1_000_000
    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    saved_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    saved_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable AQE skew handling to isolate the operators' own effect;
    # production keeps both (they compose)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    import tempfile

    workdir = tempfile.mkdtemp(prefix="skew_probe_")
    try:
        # ~50% of rows land on key 0, the rest uniform over 10k keys
        facts = (
            spark.range(rows)
            .select(
                F.when(F.col("id") % 2 == 0, 0)
                .otherwise(F.pmod(F.xxhash64("id"), 10_000))
                .alias("k"),
                (F.col("id") % 97).cast("double").alias("v"),
            )
            .repartition(32)
        )
        facts.write.mode("overwrite").parquet(os.path.join(workdir, "facts"))
        facts = spark.read.parquet(os.path.join(workdir, "facts"))
        dim = spark.range(10_000).select(
            F.col("id").alias("k"), F.concat(F.lit("name-"), "id").alias("name")
        )
        dim.write.mode("overwrite").parquet(os.path.join(workdir, "dim"))
        dim = spark.read.parquet(os.path.join(workdir, "dim"))

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        naive_agg = timed(
            lambda: noop(
                facts.groupBy("k").agg(
                    F.count("*").alias("n"), F.sum("v").alias("s"),
                    F.min("v").alias("mn"), F.max("v").alias("mx"),
                )
            )
        )
        salted_agg = timed(
            lambda: noop(
                salted_groupby(
                    facts, ["k"],
                    {"n": ("count", None), "s": ("sum", "v"),
                     "mn": ("min", "v"), "mx": ("max", "v")},
                )
            )
        )
        # disable broadcast so the naive join actually shuffles (at real
        # scale the dim may exceed the threshold; this models that)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        naive_join = timed(lambda: noop(facts.join(dim, "k")))
        hybrid_join = timed(
            lambda: noop(skew_hybrid_join(facts, dim, keys="k", hot_keys=[0]))
        )

        print(f"# skew probe: {rows:,} rows, one key holding ~50% (AQE skew-join OFF)")
        print(f"groupBy  naive={naive_agg:.2f}s salted={salted_agg:.2f}s "
              f"speedup={naive_agg / salted_agg:.2f}x")
        print(f"join     naive={naive_join:.2f}s hybrid={hybrid_join:.2f}s "
              f"speedup={naive_join / hybrid_join:.2f}x")
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        import shutil

        shutil.rmtree(os.path.join(workdir, "facts"), ignore_errors=True)
        shutil.rmtree(os.path.join(workdir, "dim"), ignore_errors=True)


if __name__ == "__main__":
    main()
