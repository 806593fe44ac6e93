#!/usr/bin/env python
"""Per-arm attribution of ``ann_recall@clustered``'s superlinear last
leg (r12 verdict wrong #3: 18.6s → 81.5s over 9→27×, 4.4× on 3×
data).

The audit has five cost carriers; each is timed to its own
materialization at every scale point on the clustered_scaled fixture:

* ``annleg_truth``       brute-force exact top-k over 32 probes
                         (n·probes cosines — linear by contract)
* ``annleg_train``       kmeans_refined_centroids, train_mod='auto'
                         (√n-sampled Lloyd)
* ``annleg_srp``         both SRP arms (bucket + Hamming-1 multiprobe)
* ``annleg_ivf_assign``  the flat-IVF corpus→cell assignment the two
                         ivf arms share (n·√n cosines — the candidate
                         superlinear term: nlist grows as √n while the
                         audit formulation scans corpus × cells flat)
* ``annleg_ivf_search``  the two ivf_topk arms end-to-end

Also extends ``ann_recall_sampled@clustered`` to 81× — the flat
sampled audit that stands in for the exact row at scale.

Emits scale_fit-shaped rows (suffix ``@clustered``) merged into
SCALE_FIT.json.

Usage: python tools/ann_recall_leg_profile.py [--out SCALE_FIT.json]
       [--mults 1,3,9,27] [--vecs1 2000]
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
    ap.add_argument("--vecs1", type=int, default=2000)
    ap.add_argument("--mults", default="1,3,9,27")
    ap.add_argument("--sampled-mults", default="1,3,9,27,81",
                    help="scale points for the ann_recall_sampled "
                         "extension (flat, so 81x is affordable)")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    smults = [int(m) for m in args.sampled_mults.split(",")]

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.queries import QUERIES
    from experts_etl_spark.llm.similarity import (
        ann_exact_truth,
        bucketed_ann_topk,
        ivf_topk,
        kmeans_refined_centroids,
        with_quantized,
    )
    from experts_etl_spark.session import get_spark
    from tools.gen_scaledata import generate

    spark = get_spark("ann_recall_leg_profile")
    root = tempfile.mkdtemp(prefix="annleg_")

    rows: dict[str, dict] = {
        "annleg_truth@clustered": {},
        "annleg_train@clustered": {},
        "annleg_srp@clustered": {},
        "annleg_ivf_assign@clustered": {},
        "annleg_ivf_search@clustered": {},
        "ann_recall_sampled@clustered": {},
    }
    vols: dict[str, dict] = {}

    def t(fn, reps=3):
        fn()  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    for mult in sorted(set(mults) | set(smults)):
        d = f"{root}/x{mult}"
        generate(d, docs=64, vecs=args.vecs1 * mult, seed=42,
                 mode="clustered_scaled")
        e = spark.read.parquet(f"{d}/embeddings.parquet").localCheckpoint()
        n = e.count()

        if mult in smults:
            rows["ann_recall_sampled@clustered"][f"t{mult}x"] = t(
                lambda: QUERIES["ann_recall_sampled"](spark, d).count()
            )

        if mult in mults:
            probes = e.filter(F.col("vec_id") < 16).localCheckpoint()

            rows["annleg_truth@clustered"][f"t{mult}x"] = t(
                lambda: ann_exact_truth(
                    e, "vec_id", "embedding", probe_max=32, k=3,
                    cache_key=None,
                ).count()
            )

            cents = None

            def train():
                nonlocal cents
                cents = kmeans_refined_centroids(
                    e, "vec_id", "embedding", iters=2, train_mod="auto"
                ).localCheckpoint()

            rows["annleg_train@clustered"][f"t{mult}x"] = t(train)
            n_cents = cents.count()

            rows["annleg_srp@clustered"][f"t{mult}x"] = t(
                lambda: (
                    bucketed_ann_topk(
                        e, probes, "vec_id", "embedding", 3, probe_hamming=0
                    ).count(),
                    bucketed_ann_topk(
                        e, probes, "vec_id", "embedding", 3, probe_hamming=1
                    ).count(),
                )
            )

            # the flat corpus→cell assignment both ivf arms share:
            # n·nlist cosines (nlist ≈ √n ⇒ n^1.5 — the audit
            # formulation's candidate superlinear term)
            from experts_etl_spark.llm.similarity import cosine, dot

            qe = with_quantized(e, "embedding").select(
                "vec_id", F.col("_q").alias("q"), F.col("_n2").alias("n2")
            )

            def assign():
                (
                    qe.join(F.broadcast(cents))
                    .withColumn(
                        "c",
                        cosine(
                            dot(F.col("q"), F.col("centq")),
                            F.col("n2"), F.col("centn2"),
                        ),
                    )
                    .groupBy("vec_id")
                    .agg(F.max("c"))
                    .count()
                )

            rows["annleg_ivf_assign@clustered"][f"t{mult}x"] = t(assign)

            rows["annleg_ivf_search@clustered"][f"t{mult}x"] = t(
                lambda: (
                    ivf_topk(e, probes, "vec_id", "embedding", 3,
                             centroids=cents).count(),
                    ivf_topk(e, probes, "vec_id", "embedding", 3,
                             nprobe=4, centroids=cents).count(),
                )
            )
            vols[f"x{mult}"] = {"n": int(n), "n_cents": int(n_cents)}

        print(f"x{mult}: " + " ".join(
            f"{k.split('@')[0]}={rows[k].get(f't{mult}x')}s"
            for k in rows if rows[k].get(f"t{mult}x") is not None
        ) + (f" vols={vols.get(f'x{mult}')}" if f"x{mult}" in vols else ""))
        shutil.rmtree(d, ignore_errors=True)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    run_meta = {
        "mults": mults,
        "sampled_mults": smults,
        "vecs_1x": args.vecs1,
        "vec_mode": "clustered_scaled",
        "volumes": vols,
        "tool": "ann_recall_leg_profile.py",
    }
    rows = {
        name: row for name, row in rows.items()
        if any(k.startswith("t") for k in row)
    }
    for name, row in rows.items():
        _fit(row, smults if name.startswith("ann_recall_sampled") else mults)
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
