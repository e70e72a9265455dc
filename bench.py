#!/usr/bin/env python
"""Benchmark: run the full declared operator inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Each query is forced to full materialization through the noop sink (no
driver-collect overhead, full plan execution).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gfw_data_api_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="gfw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JMH-style warmup: one untimed pass compiles/caches codegen for every
    # expression shape, so the timed pass measures steady-state engine
    # throughput rather than first-call JIT/classloading (set
    # SPARK_GRAFT_BENCH_WARMUP=0 to measure cold).
    queries = entrymod.queries()
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
        for fn in queries.values():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-N timed passes: single-pass numbers swing 2-4x on a shared
    # JVM (GC pauses, JIT recompiles); the minimum is the steady-state
    # throughput the engine actually sustains
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name, fn in queries.items():
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - start, 4)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            # operators that persist() intermediates (shingle/token/signature
            # indexes) would otherwise accumulate blocks across 84×N runs —
            # evict outside the timer so later queries aren't measured under
            # someone else's memory pressure
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "operator_inventory_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
