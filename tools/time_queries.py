#!/usr/bin/env python
"""Targeted per-query timing for the optimization loop: the EXACT
bench.py methodology (count() action, one cold run, min of three warm
runs, cache purge between queries) applied to a named subset of
queries, so per-family before/after numbers are comparable to the
committed BENCH artifacts without paying a full 60-query sweep per
iteration.

Usage: python tools/time_queries.py q1 q2 ...
       python tools/time_queries.py --noop q1 ...   # noop sink action
                                                    # (guide §1.4) for
                                                    # diagnosis only —
                                                    # NOT the bench
                                                    # contract number
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--noop"]
    use_noop = "--noop" in sys.argv[1:]

    from experts_etl_spark.plans import registry
    from experts_etl_spark.plans.flagship import person_assembly
    from experts_etl_spark.session import get_spark

    spark = get_spark("time_queries")

    def action(df):
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    # same JVM/codegen warmup as bench.py
    try:
        person_assembly(spark, SF_DIR).count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in args:
        if name == "flagship_person_assembly":
            fn = lambda s, d: person_assembly(s, d)  # noqa: E731
        else:
            fn = registry.QUERIES.get(name)
            if fn is None:
                print(f"unknown query: {name}", file=sys.stderr)
                continue
        spark.sparkContext.setJobDescription(f"time: {name}")
        action(fn(spark, SF_DIR))  # cold
        warm = []
        for _ in range(3):
            start = time.time()
            action(fn(spark, SF_DIR))
            warm.append(time.time() - start)
        timings[name] = round(min(warm), 3)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        print(f"{timings[name]:8.3f}  {name}  (warm runs: "
              f"{', '.join(f'{w:.3f}' for w in warm)})")
    print(json.dumps({"queries": timings, "sf_dir": SF_DIR,
                      "action": "noop" if use_noop else "count"}))
    spark.stop()


if __name__ == "__main__":
    main()
