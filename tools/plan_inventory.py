#!/usr/bin/env python
"""Regenerate the per-query plan inventory table in SCALE.md.

Counts hash/range exchanges (shuffles), broadcast exchanges, and
parquet scans in each registered query's physical plan at sf0.001
(plan shapes are size-independent).  Usage:

    python tools/plan_inventory.py        # print the markdown table
"""

from __future__ import annotations

import re
import sys


def main() -> None:
    sys.path.insert(0, ".")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )

    print("| query | shuffles | broadcasts | scans | notes |")
    print("|---|---|---|---|---|")
    for name, fn in sorted(entrymod.queries().items()):
        p = plan_of(fn(spark, "/root/testdata/sf0.001"))
        sh = len(
            re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", p)
        )
        bc = p.count("BroadcastExchange")
        sc = p.count("Scan parquet")
        notes = []
        if "BroadcastNestedLoopJoin" in p:
            notes.append("bnlj(probe-broadcast)")
        if "SortMergeJoin" in p:
            notes.append("smj")
        print(f"| {name} | {sh} | {bc} | {sc} | {', '.join(notes)} |")
    spark.stop()


if __name__ == "__main__":
    main()
