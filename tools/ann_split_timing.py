#!/usr/bin/env python
"""Index-build vs search timing split for the trained two-level ANN
headline (r7 verdict item 6).

``ann_topk_ivf2_refined``'s SCALE_FIT exp ≈ 0.97 conflates two phases
with different amortization stories: (re)indexing — Lloyd training +
hierarchical corpus assignment, paid once per index rebuild — and
search — probe assignment + the cent_id-blocked candidate join, paid
per query batch.  This tool times them separately over the same
deterministic generator scale_fit uses:

* build:  kmeans_refined_centroids(train_mod="auto") + ivf2_index,
  materialized with eager localCheckpoint (the timed action);
* search: ivf2_search over the ALREADY-materialized index — the cost a
  standing deployment pays per probe wave.

Emits scale_fit-shaped rows ``ann_ivf2_refined_build`` /
``ann_ivf2_refined_search`` (t{m}x, ratios, fitted exp) and merges
them into SCALE_FIT.json with per-row run metadata.

Usage: python tools/ann_split_timing.py [--out SCALE_FIT.json]
       [--mults 1,3,9,27] [--vecs1 2000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fit(row: dict, mults: list[int]) -> None:
    if row.get("t1x", 0) > 0:
        for m in mults[1:]:
            row[f"ratio{m}"] = round(row[f"t{m}x"] / row["t1x"], 2)
        pts = [
            (math.log(m), math.log(row[f"t{m}x"]))
            for m in mults
            if row[f"t{m}x"] > 0
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
    ap.add_argument("--vecs1", type=int, default=2000)
    ap.add_argument("--mults", default="1,3,9,27")
    ap.add_argument("--family", default="both",
                    choices=["ivf2", "ivfpq", "ivfpq_refined", "both"],
                    help="which index family to split-time ('both' = the "
                         "two r8 families; ivfpq_refined is the r9 "
                         "trained-coarse-cells composition)")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    assert mults[0] == 1, "the first multiplier must be the 1x base"

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.pq import ivfpq_index, ivfpq_search
    from experts_etl_spark.llm.similarity import (
        ivf2_index,
        ivf2_search,
        kmeans_refined_centroids,
    )
    from experts_etl_spark.session import get_spark
    from tools.gen_scaledata import generate

    def ivf2_build(e):
        cents = kmeans_refined_centroids(
            e, "vec_id", "embedding", iters=2, train_mod="auto"
        )
        cells, assignment = ivf2_index(
            e, "vec_id", "embedding", centroids=cents
        )
        # eager materialization IS the build cost
        return cells.localCheckpoint(), assignment.localCheckpoint()

    def ivf2_probe(built, e, probes):
        cells, assignment = built
        ivf2_search(
            cells, assignment, probes, "vec_id", "embedding", k=3
        ).count()

    def ivfpq_build(e):
        cells, books, index = ivfpq_index(e, "vec_id", "embedding", m=4)
        return (
            cells.localCheckpoint(),
            books.localCheckpoint(),
            index.localCheckpoint(),
        )

    def ivfpq_probe(built, e, probes):
        cells, books, index = built
        ivfpq_search(
            cells, books, index, e, probes, "vec_id", "embedding",
            k=3, m=4, refine_mult=8,
        ).count()

    def ivfpq_refined_build(e):
        # The r9 production composition: trained coarse quantizer
        # (√n-sample Lloyd) feeding the residual-PQ index build.
        cents = kmeans_refined_centroids(
            e, "vec_id", "embedding", iters=2, train_mod="auto"
        )
        cells, books, index = ivfpq_index(
            e, "vec_id", "embedding", m=4, centroids=cents
        )
        return (
            cells.localCheckpoint(),
            books.localCheckpoint(),
            index.localCheckpoint(),
        )

    families = {
        "ivf2": ("ann_ivf2_refined", ivf2_build, ivf2_probe),
        "ivfpq": ("ann_ivfpq", ivfpq_build, ivfpq_probe),
        "ivfpq_refined": (
            "ann_ivfpq_refined", ivfpq_refined_build, ivfpq_probe,
        ),
    }
    todo = ["ivf2", "ivfpq"] if args.family == "both" else [args.family]

    spark = get_spark("ann_split_timing")
    root = tempfile.mkdtemp(prefix="ann_split_")
    rows: dict[str, dict] = {}
    for fam in todo:
        prefix, build_fn, probe_fn = families[fam]
        rows[f"{prefix}_build"] = {}
        rows[f"{prefix}_search"] = {}
    for mult in mults:
        d = f"{root}/x{mult}"
        # docs are unused by the ANN path but the generator wants both
        generate(d, docs=100, vecs=args.vecs1 * mult, seed=42, mode="uniform")
        e = spark.read.parquet(f"{d}/embeddings.parquet")
        probes = e.filter(F.col("vec_id") < 16)
        for fam in todo:
            prefix, build_fn, probe_fn = families[fam]
            build_fn(e)  # warm codegen/broadcast paths
            bt, built = [], None
            for _ in range(3):
                t0 = time.time()
                built = build_fn(e)
                bt.append(time.time() - t0)
            rows[f"{prefix}_build"][f"t{mult}x"] = round(min(bt), 3)

            probe_fn(built, e, probes)  # warm
            stt = []
            for _ in range(3):
                t0 = time.time()
                probe_fn(built, e, probes)
                stt.append(time.time() - t0)
            rows[f"{prefix}_search"][f"t{mult}x"] = round(min(stt), 3)
            print(
                f"{fam} x{mult}: build={rows[f'{prefix}_build'][f't{mult}x']:.3f}s "
                f"search={rows[f'{prefix}_search'][f't{mult}x']:.3f}s"
            )
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    run_meta = {"mults": mults, "docs_1x": None, "vecs_1x": args.vecs1}
    for row in rows.values():
        _fit(row, mults)
        row["run"] = run_meta
    results = rows
    print(json.dumps(results, indent=2))
    if args.out:
        if os.path.exists(args.out):
            with open(args.out) as fh:
                prev = json.load(fh)
        else:
            prev = {"queries": {}}
        prev.setdefault("queries", {}).update(results)
        with open(args.out, "w") as fh:
            json.dump(prev, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
