#!/usr/bin/env python
"""Store directory-count micro-benchmark (r12 verdict missing #1's
"Done" condition, isolated): the SAME rows laid out as one hive
partition per tick versus the pmod-bucketed compacted segment, probed
the way every tick probes — ``read_store().count()`` (the occupancy
count of ``maybe_rebucket_srp_store``) and one bucket-join probe.

The composed-tick probe carries a ~35-45s per-tick constant (stream
machinery + every stage), which hides the listing/footer term at the
dozens-of-partitions scale the scale series reaches; the term the r12
verdict named is the ~2,200-partitions-per-YEAR deployment state.
This tool measures that state directly: N = 128 / 512 / 2048
directories of the same 100k-row store.

Usage: python tools/store_listing_bench.py [--rows 100000]
       [--dirs 128,512,2048] [--out SCALE_FIT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100000)
    ap.add_argument("--dirs", default="128,512,2048")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    dir_counts = [int(x) for x in args.dirs.split(",")]

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.similarity import srp_bucket
    from experts_etl_spark.session import get_spark
    from experts_etl_spark.streaming.stores import (
        maybe_compact_store,
        read_store,
    )

    spark = get_spark("store_listing_bench")
    root = tempfile.mkdtemp(prefix="storelist_")
    dim = 16

    def t(fn, reps=3):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    results: dict[str, dict] = {}
    for nd in dir_counts:
        store = f"{root}/s{nd}"
        base = spark.range(args.rows).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.col("id") % i.cast("long") * 2 - i).cast(
                    "double"
                ),
            ).alias("embedding"),
        )
        base = base.withColumn(
            "bucket", srp_bucket(F.col("embedding"), 8)
        ).withColumn(
            "batch_id",
            (-1 - F.pmod(F.xxhash64("vec_id"), F.lit(nd))).cast("int"),
        )
        base.write.partitionBy("batch_id").mode("overwrite").parquet(store)

        def count_probe():
            read_store(spark, store).count()

        frag_count = t(count_probe)
        batch = spark.range(500).select(
            (F.col("id") + (1 << 40)).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.col("id") % i.cast("long") * 2 - i).cast(
                    "double"
                ),
            ).alias("embedding"),
        ).withColumn("bucket", srp_bucket(F.col("embedding"), 8))
        batch = batch.localCheckpoint()

        def join_probe():
            s = read_store(spark, store)
            batch.join(
                s.select(F.col("bucket"), F.col("vec_id").alias("sid")),
                "bucket",
            ).count()

        frag_join = t(join_probe)

        comp = f"{root}/c{nd}"
        shutil.copytree(store, comp)
        assert maybe_compact_store(spark, comp, "vec_id",
                                   max_live_partitions=1)

        def count_probe_c():
            read_store(spark, comp).count()

        comp_count = t(count_probe_c)

        def join_probe_c():
            s = read_store(spark, comp)
            batch.join(
                s.select(F.col("bucket"), F.col("vec_id").alias("sid")),
                "bucket",
            ).count()

        comp_join = t(join_probe_c)
        results[f"dirs{nd}"] = {
            "frag_count_s": frag_count,
            "comp_count_s": comp_count,
            "frag_bucket_join_s": frag_join,
            "comp_bucket_join_s": comp_join,
        }
        print(f"dirs={nd}: {results[f'dirs{nd}']}")
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(comp, ignore_errors=True)

    row = {
        "run": {
            "rows": args.rows,
            "dim": dim,
            "dir_counts": dir_counts,
            "results": results,
            "tool": "store_listing_bench.py",
        }
    }
    print(json.dumps(row, indent=2))
    if args.out:
        with open(args.out) as fh:
            prev = json.load(fh)
        prev.setdefault("queries", {})["store_listing_overhead"] = row
        with open(args.out, "w") as fh:
            json.dump(prev, fh, indent=1, sort_keys=True)
        print(f"merged into {args.out}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
