"""Round-6 optimization sidecar bench: per-query timing + plan capture.

NOT part of the driver contract (bench.py is frozen for measurement).
This harness reproduces bench.py's query-stage methodology (same session
config, warmup + two timed passes, best-of-2 on .count()) and additionally:

* captures ``.explain("formatted")`` per query to ``plans/r06/<q>_<tag>.txt``;
* optionally times a noop-sink materialization (guide §1.4) so the full
  row payload is computed, isolating the computation from count-pruning;
* labels jobs via ``setJobDescription`` (guide §1.5).

Usage:
  python bench_extra.py [--tag before] [--sf-dir /root/testdata/sf1.0]
                        [--queries q1,q2] [--noop] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402  (frozen list, reused read-only)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="plan file suffix (e.g. before/after); omit to skip plan capture")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma list; default = bench.py's 16")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink write per query")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)

    from tiktok_whisper_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="twspark-bench-extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus, driver_memory="16g")
    fns = entrymod.queries()

    if args.tag:
        os.makedirs("plans/r06", exist_ok=True)

    passes: dict[str, list[float]] = {n: [] for n in names}
    noop: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        df = fns[name](spark, args.sf_dir)
        df.count()  # warmup
        if args.tag:
            with open(f"plans/r06/{name}_{args.tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    for p in range(args.passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"pass{p}: {name}")
            t0 = time.monotonic()
            fns[name](spark, args.sf_dir).count()
            passes[name].append(round(time.monotonic() - t0, 3))
    if args.noop:
        for name in names:
            spark.sparkContext.setJobDescription(f"noop: {name}")
            df = fns[name](spark, args.sf_dir)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            noop[name] = round(time.monotonic() - t0, 3)

    best = {n: min(v) for n, v in passes.items()}
    out = {"sf_dir": args.sf_dir, "best": best, "total_best": round(sum(best.values()), 2),
           "passes": passes}
    if noop:
        out["noop"] = noop
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
