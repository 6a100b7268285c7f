"""Per-query isolation bench (guide §1.4): times each declared query
with the noop sink so the computation is measured without the sink or
the count()-prune artifact, and optionally dumps .explain("formatted")
to plans/<tag>/<query>_<suffix>.txt.

This file is NOT the driver contract — bench.py stays the frozen
measurement surface.  Use this for optimization A/Bs only.

Usage:
  python scripts/bench_extra.py [sf_dir] [--plans TAG SUFFIX] [--reps N] [q ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from fin_ocr_sdk_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf1.0"
    if args and not args[0].startswith("--"):
        sf_dir = args.pop(0)
    plans_dir = suffix = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir, suffix = args[i + 1], args[i + 2]
        del args[i:i + 3]
        os.makedirs(plans_dir, exist_ok=True)
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    only = set(args)

    spark = get_spark("bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, list] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        if plans_dir:
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(f"{name:28s} {times}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "noop_sec": out}))
    spark.stop()


if __name__ == "__main__":
    main()
