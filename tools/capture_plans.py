#!/usr/bin/env python
"""Capture ``explain("formatted")`` for the headline bench queries.

Writes one file per query under plans/r14/ so plan-shape claims in
OPTIMIZATION_r14.md are verifiable without running Spark.  Usage:

    python tools/capture_plans.py before            # all headline queries
    python tools/capture_plans.py after q1 q2 ...   # only the named ones
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sys.path.insert(0, ".")
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import bench
    from experts_etl_spark.plans import registry
    from experts_etl_spark.plans.flagship import person_assembly
    from experts_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)

    names = ["flagship_person_assembly"] + list(bench.HEADLINE)
    for name in names:
        if only and name not in only:
            continue
        if name == "flagship_person_assembly":
            fn = lambda s, d: person_assembly(s, d)  # noqa: E731
        else:
            fn = registry.QUERIES.get(name)
            if fn is None:
                continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture must not abort the sweep
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
