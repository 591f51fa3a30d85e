#!/usr/bin/env python
"""Round-6 optimization harness — NOT the driver bench (bench.py is frozen).

Times individual declared queries with the noop sink (guide §1.4), labels
jobs (§1.5), and optionally writes .explain("formatted") plans. Usage:

    python bench_extra.py [--plans DIR] [--repeat N] query [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line: {"queries": {name: [sec, ...]}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from real_time_sliding_window_spark.session import get_spark

    spark = get_spark(
        app_name="rtsw-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    force(qs["tumbling_events"](spark, sf_dir))  # warmup

    out: dict[str, list[float]] = {}
    for name in args.names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(
                os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        ts = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            force(qs[name](spark, sf_dir))
            ts.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(f"## {name}: {ts}", file=sys.stderr, flush=True)

    spark.stop()
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
