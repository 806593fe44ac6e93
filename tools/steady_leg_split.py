#!/usr/bin/env python
"""Split the maintained tick's steady-state cost into its carriers
(r13 verdict next #4 — "Wrong #3": the 81× steady leg ran 1.77× on 3×
data, and SCALE.md's row-volume attribution was unproven because the
fragmented-layout comparison showed the same jump, leaving residual
listing/footer tax as a live alternative).

Method — the cc_leg_diagnosis decomposition applied to the steady
tick.  At each scale point the POST-maintenance deployment state is
primed exactly as tools/selfmaint_probe.py does (compacted stores at
the re-widened SRP width), then three rows are measured per point:

* ``steady_split_store_scan``   — Σ over the four probe stores of
  ``read_store(...).count()``: listing + footer + full column scan,
  ZERO joins.  If this leg carries the growth, the term is I/O-side
  (listing/footer/scan volume), not join work.
* ``steady_split_batch_joins``  — the batch twin ``curation_tick``
  against store DataFrames ALREADY materialized in memory
  (eager localCheckpoint): pure probe-join/compute cost, zero disk.
  If this leg carries the growth, the term is genuine row volume
  through the probe joins (the SCALE.md r13 hypothesis).
* ``steady_split_stream_total`` — the full ``run_streaming_tick``
  steady tick, the number the r13 series reported; machinery ≈
  total − scan − joins.

Emits scale_fit-shaped rows (suffix ``@heaps``) merged into
SCALE_FIT.json with per-point component shares in run meta.

Usage: python tools/steady_leg_split.py [--out SCALE_FIT.json]
       [--mults 27,81] [--docs1 5000] [--vecs1 2000]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_OFFSET = 1 << 40


def _fit(row: dict, mults: list[int]) -> None:
    base = mults[0]
    if row.get(f"t{base}x", 0) > 0:
        for m in mults[1:]:
            if f"t{m}x" in row:
                row[f"ratio{m}_vs_{base}"] = round(
                    row[f"t{m}x"] / row[f"t{base}x"], 2
                )
        pts = [
            (math.log(m), math.log(row[f"t{m}x"]))
            for m in mults
            if row.get(f"t{m}x", 0) > 0
        ]
        if len(pts) >= 2:
            mx = sum(p[0] for p in pts) / len(pts)
            my = sum(p[1] for p in pts) / len(pts)
            den = sum((p[0] - mx) ** 2 for p in pts)
            if den > 0:
                row["exp"] = round(
                    sum((p[0] - mx) * (p[1] - my) for p in pts) / den, 2
                )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--docs1", type=int, default=5000)
    ap.add_argument("--vecs1", type=int, default=2000)
    ap.add_argument("--mults", default="27,81")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.curation import substring_window_store
    from experts_etl_spark.llm.dedup import signature_shingle_sets
    from experts_etl_spark.llm.pq import pq_recon_ppm, pq_train
    from experts_etl_spark.llm.similarity import auto_srp_bits, srp_bucket
    from experts_etl_spark.llm.text import fingerprint
    from experts_etl_spark.session import get_spark
    from experts_etl_spark.streaming.stores import (
        maybe_compact_store,
        read_store,
    )
    from experts_etl_spark.streaming.tick import (
        curation_tick,
        run_streaming_tick,
    )
    from tools.gen_scaledata import generate

    spark = get_spark("steady_leg_split")
    root = tempfile.mkdtemp(prefix="steadysplit_")
    bits0 = auto_srp_bits(args.vecs1)

    for i in range(3):
        generate(f"{root}/b{i}", docs=args.docs1, vecs=args.vecs1,
                 seed=100 + i, mode="uniform", corpus="heaps")

    def gen_batch(i: int):
        d = f"{root}/b{i}"
        docs = spark.read.parquet(f"{d}/documents.parquet").withColumn(
            "doc_id", F.col("doc_id") + (ID_OFFSET + i * args.docs1)
        )
        emb = spark.read.parquet(f"{d}/embeddings.parquet").withColumn(
            "vec_id", F.col("vec_id") + (ID_OFFSET + i * args.docs1)
        )
        return docs, emb

    rows: dict[str, dict] = {
        "steady_split_store_scan@heaps": {},
        "steady_split_batch_joins@heaps": {},
        "steady_split_stream_total@heaps": {},
    }
    shares: dict[str, dict] = {}

    for mult in mults:
        d = f"{root}/x{mult}"
        generate(d, docs=args.docs1 * mult, vecs=args.vecs1 * mult,
                 seed=42, mode="uniform", corpus="heaps")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        bits_m = auto_srp_bits(args.vecs1 * mult)  # post-maintenance width
        n_vec = args.vecs1 * mult

        fps = docs.select(fingerprint(F.col("text")).alias("fp")).distinct()
        sigs = signature_shingle_sets(docs, "text", "doc_id")
        win = substring_window_store(docs, "text", "doc_id")

        base = f"{root}/st_x{mult}"
        shutil.rmtree(base, ignore_errors=True)
        part = lambda key: (  # noqa: E731  (selfmaint_probe convention)
            -1 - F.pmod(
                F.xxhash64(F.col(key).cast("string")), F.lit(mult)
            )
        ).cast("int").alias("batch_id")
        for content, key, sub in (
            (fps, "fp", "_fingerprints"),
            (sigs, "doc_id", "_signatures"),
            (win, "win", "_window_counts"),
        ):
            content.withColumn("batch_id", part(key)).write.partitionBy(
                "batch_id"
            ).mode("overwrite").parquet(f"{base}/{sub}")
        kembs = emb.select(
            "vec_id", "embedding",
            srp_bucket(F.col("embedding"), bits_m).alias("bucket"),
        ).withColumn("batch_id", part("vec_id"))
        kembs.write.partitionBy("batch_id").mode("overwrite").parquet(
            f"{base}/_kept_embeddings"
        )
        spark.createDataFrame(
            [(int(bits_m), int(n_vec))], "bits int, n_kept bigint"
        ).write.mode("overwrite").parquet(
            f"{base}/_kept_embeddings/_srp_meta"
        )
        # post-maintenance layout: everything folded
        for sub, key in (("_fingerprints", "fp"), ("_signatures", "doc_id"),
                         ("_window_counts", "win"),
                         ("_kept_embeddings", "vec_id")):
            maybe_compact_store(spark, f"{base}/{sub}", key,
                                max_live_partitions=1)

        books_dir = f"{root}/books_x{mult}"
        _, books = pq_train(emb, "vec_id", "embedding", train_mod="auto")
        books.write.mode("overwrite").parquet(books_dir)
        probe_docs, probe_emb = gen_batch(0)
        intrinsic = pq_recon_ppm(
            probe_emb, spark.read.parquet(books_dir), "vec_id", "embedding"
        )
        threshold = max(4 * intrinsic, 100)
        emb.write.mode("overwrite").parquet(f"{base}/_embs")

        def best_of(fn, n=2):
            fn()  # warm
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            return round(best, 3)

        # --- leg 1: store scan (listing + footers + column scan) ------
        stores = (
            ("_fingerprints",), ("_signatures",), ("_window_counts",),
            ("_kept_embeddings",),
        )

        def scan_all():
            for (sub,) in stores:
                read_store(spark, f"{base}/{sub}").count()

        t_scan = best_of(scan_all)
        rows["steady_split_store_scan@heaps"][f"t{mult}x"] = t_scan

        # --- leg 2: probe joins on in-memory stores -------------------
        mem = {
            sub: read_store(
                spark, f"{base}/{sub}", drop_batch_id=True
            ).localCheckpoint(eager=True)
            for (sub,) in stores
        }
        bdocs, bemb = gen_batch(1)
        bdocs = bdocs.localCheckpoint(eager=True)
        bemb = bemb.localCheckpoint(eager=True)

        def joins():
            routed, _ = curation_tick(
                bdocs, bemb,
                sem_bits=bits_m,
                kept_fps=mem["_fingerprints"],
                index_signatures=mem["_signatures"],
                window_store=mem["_window_counts"],
                kept_embeddings=mem["_kept_embeddings"],
            )
            routed.count()

        t_joins = best_of(joins)
        rows["steady_split_batch_joins@heaps"][f"t{mult}x"] = t_joins
        for df in mem.values():
            df.unpersist()

        # --- leg 3: the full streaming steady tick --------------------
        def land(i: int) -> str:
            dd, _ = gen_batch(i)
            src = f"{base}/_src"
            os.makedirs(src, exist_ok=True)
            stage = f"{base}/_stage{i}"
            dd.coalesce(1).write.mode("overwrite").parquet(stage)
            (pf,) = glob.glob(f"{stage}/*.parquet")
            shutil.copy(pf, f"{src}/b{i}.parquet")
            return src

        times = []
        for i in range(1, 3):
            src = land(i)
            _, ee = gen_batch(i)
            ee.write.mode("append").parquet(f"{base}/_embs")
            t0 = time.time()
            run_streaming_tick(
                spark, src, f"{base}/_embs", base, f"{base}/_ckpt",
                sem_bits=bits0,
                books_path=books_dir,
                pq_recon_ppm_threshold=threshold,
                sem_occupancy_limit=8,
                compact_after=4,
            )
            times.append(time.time() - t0)
        t_total = round(min(times), 3)
        rows["steady_split_stream_total@heaps"][f"t{mult}x"] = t_total

        shares[f"x{mult}"] = {
            "scan_s": t_scan,
            "joins_s": t_joins,
            "total_s": t_total,
            "machinery_s": round(max(t_total - t_scan - t_joins, 0.0), 3),
        }
        print(f"x{mult}: scan={t_scan}s joins={t_joins}s total={t_total}s")
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    run_meta = {
        "mults": mults,
        "docs_1x": args.docs1,
        "vecs_1x": args.vecs1,
        "corpus": "heaps",
        "component_shares": shares,
        "tool": "steady_leg_split.py",
    }
    for row in rows.values():
        _fit(row, mults)
        row["run"] = dict(run_meta)
    print(json.dumps(rows, indent=2))
    if args.out:
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as fh:
                merged = json.load(fh)
        merged.update(rows)
        with open(args.out, "w") as fh:
            json.dump(merged, fh, indent=2)
        print(f"merged into {args.out}")


if __name__ == "__main__":
    main()
