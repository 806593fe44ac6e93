#!/usr/bin/env python
"""Self-maintaining STREAMING tick probe (r12 verdict next #7) plus
the compacted-vs-fragmented store layout re-measure (next #2's "Done"
condition).

Unlike tools/incremental_split_timing.py — which times the batch-level
``curation_tick`` against in-memory store DataFrames — this tool times
``run_streaming_tick`` itself against PERSISTED stores on disk, with
the maintenance arms armed, so the measured number includes everything
a deployment's tick pays: stream machinery, store listing + footer
reads, the occupancy count, replay-exclusion filters, and (on the
ticks where they fire) the SRP re-bucket, the partition fold, and the
PQ rebuild.

Per archive scale point (1/3/9/27/81 × a 5k-doc/2k-vector base):

* ``tick_stream_frag_probe``  — steady tick against the PRE-compaction
  deployment state: one ``batch_id=N`` directory per historical tick
  (``mult`` of them), the r12 verdict's unbounded-growth complaint.
* ``tick_stream_comp_probe``  — the SAME store content folded into the
  pmod-bucketed ``_compacted`` segment (streaming/stores.py).  The gap
  between these two rows is the listing/count overhead compaction
  removes.
* ``tick_selfmaint_maint_tick`` — the tick on which maintenance FIRES:
  store primed at the 1×-corpus creation width with ``mult`` live
  dirs; ``sem_occupancy_limit`` + ``compact_after`` trip, so this one
  tick pays the re-bucket AND the fold (both archive-linear by
  contract — the amortized spike).
* ``tick_selfmaint_steady_probe`` — the next ticks on the same store,
  post-maintenance: must be flat in the archive (THE headline row).
* ``tick_selfmaint_pq_rebuild_tick`` (mults 1/3/9) — a drifted batch
  (embeddings rescaled 1/128) trips ``pq_recon_ppm_threshold`` and the
  tick pays the transactional rebuild: sampled retrain + full
  re-encode, linear by contract; the following steady tick confirms
  the stream returns to flat.

Emits scale_fit-shaped rows merged into SCALE_FIT.json.

Usage: python tools/selfmaint_probe.py [--out SCALE_FIT.json]
       [--mults 1,3,9,27,81] [--docs1 5000] [--vecs1 2000]
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

ID_OFFSET = 1 << 40  # batch ids sit above any archive id


def _fit(row: dict, mults: list[int]) -> None:
    if row.get("t1x", 0) > 0:
        for m in mults[1:]:
            if f"t{m}x" in row:
                row[f"ratio{m}"] = round(row[f"t{m}x"] / row["t1x"], 2)
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
    ap.add_argument("--mults", default="1,3,9,27,81")
    ap.add_argument("--rebuild-mults", default="1,3,9",
                    help="scale points at which the PQ-rebuild spike is "
                         "measured (linear by contract; the fit needs "
                         "three points, not the 81x wait)")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    rebuild_mults = {int(m) for m in args.rebuild_mults.split(",")}
    assert mults[0] == 1

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.curation import substring_window_store
    from experts_etl_spark.llm.dedup import signature_shingle_sets
    from experts_etl_spark.llm.pq import pq_recon_ppm, pq_train
    from experts_etl_spark.llm.similarity import auto_srp_bits, srp_bucket
    from experts_etl_spark.llm.text import fingerprint
    from experts_etl_spark.session import get_spark
    from experts_etl_spark.streaming.stores import maybe_compact_store
    from experts_etl_spark.streaming.tick import run_streaming_tick
    from tools.gen_scaledata import generate

    spark = get_spark("selfmaint_probe")
    root = tempfile.mkdtemp(prefix="selfmaint_")
    bits0 = auto_srp_bits(args.vecs1)  # creation width: the 1x corpus

    # fresh 1x-sized batches, ids above every archive id; one file per
    # tick so each run_streaming_tick call drains exactly one batch
    for i in range(5):
        generate(f"{root}/b{i}", docs=args.docs1, vecs=args.vecs1,
                 seed=100 + i, mode="uniform", corpus="heaps")

    def gen_batch(i: int, drift: bool = False):
        d = f"{root}/b{i}"
        docs = spark.read.parquet(f"{d}/documents.parquet").withColumn(
            "doc_id", F.col("doc_id") + (ID_OFFSET + i * args.docs1)
        )
        emb = spark.read.parquet(f"{d}/embeddings.parquet").withColumn(
            "vec_id", F.col("vec_id") + (ID_OFFSET + i * args.docs1)
        )
        if drift:
            emb = emb.select(
                "vec_id",
                F.transform(
                    F.col("embedding"),
                    lambda x: (x.cast("double") / F.lit(128.0)).cast("float"),
                ).alias("embedding"),
            )
        return docs, emb

    rows: dict[str, dict] = {
        "tick_stream_frag_probe": {},
        "tick_stream_comp_probe": {},
        "tick_selfmaint_maint_tick": {},
        "tick_selfmaint_steady_probe": {},
        "tick_selfmaint_pq_rebuild_tick": {},
    }
    fired: dict[str, dict] = {}

    for mult in mults:
        d = f"{root}/x{mult}"
        # heaps corpus: scale-invariant chance collisions (the
        # representative fixture) — the fixed-vocab corpus saturates at
        # high mults and rejects whole batches as near-duplicates,
        # which would measure an empty pipeline instead of a probe
        generate(d, docs=args.docs1 * mult, vecs=args.vecs1 * mult,
                 seed=42, mode="uniform", corpus="heaps")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        bits_m = auto_srp_bits(args.vecs1 * mult)
        n_vec = args.vecs1 * mult

        # store CONTENT (computed once, written into each layout)
        fps = docs.select(fingerprint(F.col("text")).alias("fp")).distinct()
        sigs = signature_shingle_sets(docs, "text", "doc_id")
        win = substring_window_store(docs, "text", "doc_id")

        def prime(base: str, kemb_bits: int, n_dirs: int) -> None:
            """Write the tick-layout stores: content split into
            ``n_dirs`` batch_id partitions (the one-dir-per-tick
            deployment state), kept-embedding bucket + meta at
            ``kemb_bits``."""
            shutil.rmtree(base, ignore_errors=True)
            # backfill partitions use NEGATIVE batch ids (-n_dirs..-1,
            # the curation.py batch_id=-1 convention) so they can never
            # collide with foreachBatch's 0-based tick ids — a collision
            # would make tick N's replay exclusion wrongly hide archive
            # rows sharing its id
            part = lambda key: (  # noqa: E731
                -1 - F.pmod(
                    F.xxhash64(F.col(key).cast("string")), F.lit(n_dirs)
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
                srp_bucket(F.col("embedding"), kemb_bits).alias("bucket"),
            ).withColumn("batch_id", part("vec_id"))
            kembs.write.partitionBy("batch_id").mode("overwrite").parquet(
                f"{base}/_kept_embeddings"
            )
            spark.createDataFrame(
                [(int(kemb_bits), int(n_vec))], "bits int, n_kept bigint"
            ).write.mode("overwrite").parquet(
                f"{base}/_kept_embeddings/_srp_meta"
            )

        # standing codebooks for this archive + a no-fire threshold
        books_dir = f"{root}/books_x{mult}"
        _, books = pq_train(emb, "vec_id", "embedding", train_mod="auto")
        books.write.mode("overwrite").parquet(books_dir)
        probe_docs, probe_emb = gen_batch(0)
        intrinsic = pq_recon_ppm(
            probe_emb, spark.read.parquet(books_dir), "vec_id", "embedding"
        )
        threshold = max(4 * intrinsic, 100)

        def tick(base: str, src: str, ckpt: str, **kw) -> float:
            t0 = time.time()
            run_streaming_tick(
                spark, src, f"{base}/_embs", base, ckpt,
                sem_bits=bits0,
                books_path=books_dir,
                pq_recon_ppm_threshold=threshold,
                sem_occupancy_limit=8,
                **kw,
            )
            return time.time() - t0

        def land(base: str, i: int, drift: bool = False):
            dd, ee = gen_batch(i, drift)
            src = f"{base}/_src"
            os.makedirs(src, exist_ok=True)
            stage = f"{base}/_stage{i}"
            dd.coalesce(1).write.mode("overwrite").parquet(stage)
            (part_file,) = glob.glob(f"{stage}/*.parquet")
            shutil.copy(part_file, f"{src}/b{i}.parquet")
            ee.write.mode("append").parquet(f"{base}/_embs")
            return src

        def setup_embs(base: str):
            emb.write.mode("overwrite").parquet(f"{base}/_embs")

        # --- A: layout comparison at the POST-maintenance width --------
        frag = f"{root}/frag_x{mult}"
        prime(frag, bits_m, n_dirs=mult)
        setup_embs(frag)
        times = []
        for i in range(2):
            src = land(frag, i)
            times.append(tick(frag, src, f"{frag}/_ckpt"))
        rows["tick_stream_frag_probe"][f"t{mult}x"] = round(min(times), 3)

        comp = f"{root}/comp_x{mult}"
        prime(comp, bits_m, n_dirs=mult)
        setup_embs(comp)
        for sub, key in (("_fingerprints", "fp"), ("_signatures", "doc_id"),
                         ("_window_counts", "win"),
                         ("_kept_embeddings", "vec_id")):
            maybe_compact_store(spark, f"{comp}/{sub}", key,
                                max_live_partitions=1)
        times = []
        for i in range(2):
            src = land(comp, i)
            times.append(tick(comp, src, f"{comp}/_ckpt"))
        rows["tick_stream_comp_probe"][f"t{mult}x"] = round(min(times), 3)

        # --- B: the maintenance tick + post-maintenance steady state ---
        mnt = f"{root}/mnt_x{mult}"
        prime(mnt, bits0, n_dirs=mult)  # creation width: trigger armed
        setup_embs(mnt)
        src = land(mnt, 0)
        spike = tick(mnt, src, f"{mnt}/_ckpt", compact_after=4)
        rows["tick_selfmaint_maint_tick"][f"t{mult}x"] = round(spike, 3)
        meta = spark.read.parquet(
            f"{mnt}/_kept_embeddings/_srp_meta"
        ).first()
        folded = bool(glob.glob(
            f"{mnt}/_kept_embeddings/_compacted/part_key=*"
        ))
        fired[f"x{mult}"] = {
            "rebucketed_to": int(meta["bits"]),
            "rebucket_fired": int(meta["bits"]) > bits0,
            "fold_fired": folded,
        }
        times = []
        for i in range(1, 3):
            src = land(mnt, i)
            times.append(tick(mnt, src, f"{mnt}/_ckpt", compact_after=4))
        rows["tick_selfmaint_steady_probe"][f"t{mult}x"] = round(
            min(times), 3
        )

        # --- C: the PQ-rebuild spike (linear by contract) ---------------
        if mult in rebuild_mults:
            src = land(mnt, 3, drift=True)
            rows["tick_selfmaint_pq_rebuild_tick"][f"t{mult}x"] = round(
                tick(mnt, src, f"{mnt}/_ckpt", compact_after=4), 3
            )
            n_rebuilds = len(
                glob.glob(f"{mnt}/_pq_rebuilds/rebuild_batch=*")
            )
            fired[f"x{mult}"]["pq_rebuild_fired"] = n_rebuilds > 0
            # post-rebuild steady tick: the stream returns to flat
            src = land(mnt, 4)
            fired[f"x{mult}"]["post_rebuild_tick_s"] = round(
                tick(mnt, src, f"{mnt}/_ckpt", compact_after=4), 3
            )

        print(f"x{mult}: " + " ".join(
            f"{k}={rows[k].get(f't{mult}x')}s"
            for k in rows if rows[k].get(f"t{mult}x") is not None
        ) + f" fired={fired[f'x{mult}']}")
        for sub in (f"{root}/frag_x{mult}", f"{root}/comp_x{mult}",
                    f"{root}/mnt_x{mult}", f"{root}/x{mult}"):
            shutil.rmtree(sub, ignore_errors=True)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    run_meta = {
        "mults": mults,
        "docs_1x": args.docs1,
        "vecs_1x": args.vecs1,
        "streaming": True,
        "creation_bits": bits0,
        "occupancy_limit": 8,
        "fired": fired,
        "tool": "selfmaint_probe.py",
    }
    rows = {
        name: row for name, row in rows.items()
        if any(k.startswith("t") for k in row)
    }
    for row in rows.values():
        _fit(row, mults)
        row["run"] = dict(run_meta)
    print(json.dumps(rows, indent=2))
    if args.out:
        if os.path.exists(args.out):
            with open(args.out) as fh:
                prev = json.load(fh)
        else:
            prev = {"queries": {}}
        prev.setdefault("queries", {}).update(rows)
        with open(args.out, "w") as fh:
            json.dump(prev, fh, indent=1, sort_keys=True)
        print(f"merged {len(rows)} rows into {args.out}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
