#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named query: one warmup pass, then a timed noop-sink pass run
inside a dedicated job group so the Spark job/stage counts attributable
to the query are exact.  Prints per-query wall seconds, #jobs, #stages,
#tasks, and optionally dumps ``explain("formatted")`` to a file.

Usage:
    python tools/qprofile.py q25 d09 g01            # profile these
    python tools/qprofile.py --explain-dir plans/r12 --suffix before g01
    python tools/qprofile.py --no-warmup d09        # cold numbers

Wall time covers DataFrame construction (Python-side plan building,
driver-side sampling/training actions) PLUS the noop write — the same
span bench.py times.  Job counts come from the status tracker; jobs
run during construction (collects, persists, checkpoints, broadcasts)
land in the same group because the group is set before construction.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfw_data_api_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+", help="query-name prefixes to profile")
    ap.add_argument("--explain-dir", default=None, help="dump explain('formatted') here")
    ap.add_argument("--suffix", default="before", help="explain file suffix (before/after)")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    queries = dict(sorted(entrymod.queries().items()))
    selected = {
        n: f for n, f in queries.items() if n.startswith(tuple(args.names))
    }
    if not selected:
        raise SystemExit(f"no queries match {args.names}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="gfw-qprofile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    print(f"{'query':<34} {'best_s':>7} {'passes':>22} {'jobs':>5} {'stages':>7} {'tasks':>6}")
    for name, fn in selected.items():
        if not args.no_warmup:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        times = []
        njobs = nstages = ntasks = 0
        for p in range(args.passes):
            group = f"prof-{name}-{p}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            if p == args.passes - 1:
                job_ids = tracker.getJobIdsForGroup(group)
                njobs = len(job_ids)
                stage_ids = set()
                for j in job_ids:
                    info = tracker.getJobInfo(j)
                    if info:
                        stage_ids.update(info.stageIds)
                nstages = len(stage_ids)
                for s in stage_ids:
                    si = tracker.getStageInfo(s)
                    if si:
                        ntasks += si.numTasks
                if args.explain_dir:
                    import io
                    from contextlib import redirect_stdout

                    os.makedirs(args.explain_dir, exist_ok=True)
                    path = os.path.join(
                        args.explain_dir, f"{name}_{args.suffix}.txt"
                    )
                    # a noop WRITE executes a separate QueryExecution, so
                    # this df's own plan would still print isFinalPlan=false
                    # — run collect() on the df itself (the plan_audit.py
                    # convention) so the dump shows the final adaptive plan
                    # (ADVICE r12). The collect runs outside the timed span.
                    df.collect()
                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        df.explain("formatted")
                    with open(path, "w") as fh:
                        fh.write(buf.getvalue())
            spark.catalog.clearCache()
        shown = " ".join(f"{t:.2f}" for t in times)
        print(
            f"{name:<34} {min(times):>7.2f} {shown:>22} {njobs:>5} {nstages:>7} {ntasks:>6}"
        )


if __name__ == "__main__":
    main()
