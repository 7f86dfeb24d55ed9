"""Isolated per-query probe harness (guide §1) — NOT the driver bench.

Times individual gate queries with the noop sink against an arbitrary
sf dir, optionally capturing `.explain("formatted")` to a file.  The
frozen driver contract lives in bench.py; this file exists so plan/
timing probes never touch it.

Usage:
  python bench_extra.py [--sf DIR] [--cpus N] [--trials K]
                        [--plans OUTDIR] [--suffix TAG] query [query...]

Prints one line per (query, trial): `<name> <trial> <sec>` and a final
JSON summary line {"sf":..., "queries": {name: [secs...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dir to write <query><suffix>.txt explain output")
    ap.add_argument("--suffix", default="", help="filename suffix for plan files, e.g. _before")
    ap.add_argument("--no-warm", action="store_true", help="skip the sf0.001 codegen warmup")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from osmquadtree_rust_spark import gate as G
    from osmquadtree_rust_spark import gate_text  # noqa: F401 (registers)
    from osmquadtree_rust_spark.session import get_spark

    spark = get_spark(
        "bench_extra", master=f"local[{args.cpus}]", shuffle_partitions=max(args.cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.queries:
        if name not in G.GATE or "spark" not in G.GATE[name]:
            raise SystemExit(f"unknown query: {name}")

    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warm and os.path.isdir(warm_dir):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            G.GATE[name]["spark"](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.queries:
            df = G.GATE[name]["spark"](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(txt)

    times: dict[str, list[float]] = {n: [] for n in args.queries}
    for trial in range(args.trials):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"probe:{name}:t{trial}")
            t0 = time.time()
            G.GATE[name]["spark"](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            times[name].append(dt)
            print(f"{name} {trial} {dt}", flush=True)
    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()
