#!/usr/bin/env python
"""Per-stage attribution of ``dedup_cluster_resolution_lsh@heaps``'s
superlinear last leg (r12 verdict next #3 — the 27→81× leg ran 3.84×
on 3× data; ``training_corpus_pipeline@heaps`` 3.24×).

The r12 LSH diagnosis method, applied to the CC query's stages: at
every scale point on the heaps corpus, time each stage to a
materialization AND record the volume that stage's cost should track —

* ``cc_sig_build``      signature aggregation        (rows = docs)
* ``cc_cand_mine``      banded candidate self-join   (``n_cands``)
* ``cc_verify``         exact-Jaccard verification   (``n_edges``)
* ``cc_resolve``        hash-min label propagation   (``rounds``,
                        ``sym_edges``, ``n_nodes``)

If the leg is band-volume (chance collisions), ``n_cands`` grows
superlinearly and ``cc_cand_mine``/``cc_verify`` carry the time; if it
is iteration count, ``rounds`` grows; if neither moves, the term is
shuffle-partition pressure and shows up only in wall time.

Emits scale_fit-shaped rows (suffix ``@heaps``) merged into
SCALE_FIT.json, with volumes in the run metadata.

Usage: python tools/cc_leg_diagnosis.py [--out SCALE_FIT.json]
       [--mults 1,3,9,27,81] [--docs1 5000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    ap.add_argument("--mults", default="1,3,9,27,81")
    ap.add_argument(
        "--max-df",
        default="production",
        help="band-key cap for the candidate miner: 'production' "
        "(= llm/dedup.py:LSH_MAX_DF, the r14 default the gated "
        "queries run), 'none' (the uncapped r13 baseline this tool "
        "originally diagnosed), or an integer",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.curation import connected_components
    from experts_etl_spark.llm.dedup import (
        LSH_MAX_DF,
        lsh_candidates,
        signature_shingle_sets,
    )
    from experts_etl_spark.session import get_spark
    from tools.gen_scaledata import generate

    if args.max_df == "production":
        max_df = LSH_MAX_DF
    elif args.max_df == "none":
        max_df = None
    else:
        max_df = int(args.max_df)

    spark = get_spark("cc_leg_diagnosis")
    root = tempfile.mkdtemp(prefix="cc_diag_")

    # capped rows keep the original (uncapped-era) names so SCALE_FIT
    # series line up round-over-round; the cap value rides in run meta
    rows: dict[str, dict] = {
        "cc_sig_build@heaps": {},
        "cc_cand_mine@heaps": {},
        "cc_verify@heaps": {},
        "cc_resolve@heaps": {},
    }
    vols: dict[str, dict] = {}

    for mult in mults:
        d = f"{root}/x{mult}"
        generate(d, docs=args.docs1 * mult, vecs=64, seed=42,
                 mode="uniform", corpus="heaps")
        docs = spark.read.parquet(f"{d}/documents.parquet")

        def t(fn):
            fn()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            return round(best, 3)

        sigsets = None

        def sig_build():
            nonlocal sigsets
            sigsets = signature_shingle_sets(
                docs, "text", "doc_id"
            ).localCheckpoint()

        rows["cc_sig_build@heaps"][f"t{mult}x"] = t(sig_build)

        cands = None

        def cand_mine():
            nonlocal cands
            cands = lsh_candidates(
                sigsets.drop("sh"), "doc_id", max_df=max_df
            ).localCheckpoint()

        rows["cc_cand_mine@heaps"][f"t{mult}x"] = t(cand_mine)
        n_cands = cands.count()

        edges = None
        a = sigsets.select(
            F.col("doc_id").alias("id1"), F.col("sh").alias("sh1")
        )
        b = sigsets.select(
            F.col("doc_id").alias("id2"), F.col("sh").alias("sh2")
        )

        def verify():
            nonlocal edges
            scored = (
                cands.join(a, "id1")
                .join(b, "id2")
                .withColumn(
                    "n_inter", F.size(F.array_intersect("sh1", "sh2"))
                )
                .withColumn(
                    "jaccard",
                    F.col("n_inter").cast("double")
                    / (
                        F.size("sh1") + F.size("sh2") - F.col("n_inter")
                    ).cast("double"),
                )
            )
            edges = scored.filter(F.col("jaccard") >= 0.5).select(
                "id1", "id2", "jaccard"
            ).localCheckpoint()

        rows["cc_verify@heaps"][f"t{mult}x"] = t(verify)
        n_edges = edges.count()

        stats: dict = {}

        def resolve():
            stats.clear()
            cc = connected_components(edges, stats=stats)
            sizes = cc.groupBy("comp").agg(
                F.count(F.lit(1)).alias("cluster_size")
            )
            cc.join(sizes, "comp").count()

        rows["cc_resolve@heaps"][f"t{mult}x"] = t(resolve)
        vols[f"x{mult}"] = {
            "docs": args.docs1 * mult,
            "n_cands": int(n_cands),
            "n_edges": int(n_edges),
            "cc_rounds": stats.get("rounds"),
            "sym_edges": stats.get("sym_edges"),
        }
        print(f"x{mult}: " + " ".join(
            f"{k.split('@')[0]}={rows[k].get(f't{mult}x')}s" for k in rows
        ) + f" vols={vols[f'x{mult}']}")
        shutil.rmtree(d, ignore_errors=True)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    run_meta = {
        "mults": mults,
        "docs_1x": args.docs1,
        "corpus": "heaps",
        "max_df": max_df,
        "volumes": vols,
        "tool": "cc_leg_diagnosis.py",
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
