#!/usr/bin/env python
"""PQ read-knob recall sweep — re-run of the r9 knob-attribution
measurement with the r10 SELF-SCALED knobs included, so the table
shows where auto_nprobe / auto_refine_mult land relative to the
measured knee (r9 verdict missing #3, done-criterion).

For each corpus (sf0.1 uniform testdata + a clustered 2k fixture):

* flat ADC (``pq_adc_topk``) over a refine_mult grid + the auto value;
* IVFADC over trained cells (``ivfpq_topk`` + kmeans_refined
  centroids) over an nprobe grid at the r9 refine_mult=8 baseline,
  a refine_mult grid at the r9 nprobe=2 baseline, and the full-auto
  point.

Metrics per configuration, against the shared brute-force truth
(llm/similarity.py:ann_exact_truth, 32 probes, k=3):

* id-recall@3 — hits / possible;
* effective recall — Σ true cosines of returned ids / Σ true cosines
  of the exact top-3 (≤ 1 by optimality of the exact top-k; the
  metric that matters when near-ties quantize to the same codes).

Writes PQ_KNOB_SWEEP.json and prints a markdown table for SCALE.md.

Usage: python tools/pq_knob_sweep.py [--out PQ_KNOB_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PQ_KNOB_SWEEP.json")
    ap.add_argument("--sf-uniform", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.pq import (
        auto_nprobe,
        auto_refine_mult,
        ivfpq_index,
        pq_adc_topk,
        ivfpq_topk,
    )
    from experts_etl_spark.llm.similarity import (
        ann_exact_truth,
        brute_force_topk,
        kmeans_refined_centroids,
    )
    from experts_etl_spark.session import get_spark
    from tools.gen_scaledata import generate

    spark = get_spark("pq_knob_sweep")
    root = tempfile.mkdtemp(prefix="knob_sweep_")
    cdir = f"{root}/clustered"
    generate(cdir, docs=50, vecs=2000, seed=7, mode="clustered")

    corpora = {
        "sf0.1_uniform": f"{args.sf_uniform}/embeddings.parquet",
        "clustered_2k": f"{cdir}/embeddings.parquet",
    }
    results: dict = {}
    for cname, path in corpora.items():
        e = spark.read.parquet(path)
        n = e.count()
        probes = e.filter(F.col("vec_id") < 32)
        # truth WITH exact cosines (ann_exact_truth drops cos; recompute
        # the slim frame once here and localCheckpoint it)
        truth = brute_force_topk(
            e, probes, "vec_id", "embedding", 3
        ).select("probe_id", "cand_id", "cos").localCheckpoint()
        possible = truth.count()
        truth_mass = truth.agg(F.sum("cos")).collect()[0][0]

        cents = kmeans_refined_centroids(
            e, "vec_id", "embedding", iters=2, train_mod="auto"
        ).localCheckpoint()
        nlist = cents.count()
        auto_np = auto_nprobe(nlist)
        auto_rm = auto_refine_mult(n, 3)

        def measure(approx):
            # id recall: returned ∩ exact top-3.  EFFECTIVE recall: the
            # TRUE cosines of ALL returned ids over the exact top-3's
            # mass (both search paths re-rank exactly, so approx.cos IS
            # the true cosine) — ≤ 1 by optimality of the exact top-k;
            # the metric that matters when near-ties quantize to the
            # same codes (r9 definition).
            ret = approx.select("probe_id", "cand_id", "cos").localCheckpoint()
            hits = truth.select("probe_id", "cand_id").join(
                ret.select("probe_id", "cand_id"), ["probe_id", "cand_id"]
            ).count()
            ret_mass = ret.agg(F.sum("cos")).collect()[0][0]
            return {
                "id_recall": round(hits / possible, 3),
                "eff_recall": round(float(ret_mass or 0.0) / truth_mass, 3),
            }

        configs = []
        for rm in [4, 8, 16, auto_rm]:
            tag = f"adc_rm{rm}" + ("_AUTO" if rm == auto_rm else "")
            configs.append(
                (tag, lambda rm=rm: pq_adc_topk(
                    e, probes, "vec_id", "embedding", k=3, m=4,
                    iters=2, refine_mult=rm,
                ))
            )
        for np_ in [2, 4, 8, auto_np]:
            tag = f"ivfpq_np{np_}_rm8" + ("_AUTOnp" if np_ == auto_np else "")
            configs.append(
                (tag, lambda np_=np_: ivfpq_topk(
                    e, probes, "vec_id", "embedding", k=3, m=4, iters=2,
                    refine_mult=8, nprobe=np_, centroids=cents,
                ))
            )
        for rm in [8, 16, auto_rm]:
            tag = f"ivfpq_np2_rm{rm}" + ("_AUTOrm" if rm == auto_rm else "")
            configs.append(
                (tag, lambda rm=rm: ivfpq_topk(
                    e, probes, "vec_id", "embedding", k=3, m=4, iters=2,
                    refine_mult=rm, nprobe=2, centroids=cents,
                ))
            )
        configs.append(
            ("ivfpq_FULL_AUTO", lambda: ivfpq_topk(
                e, probes, "vec_id", "embedding", k=3, m=4, iters=2,
                centroids=cents,
            ))
        )
        crows = {}
        for tag, fn in configs:
            if tag in crows:
                continue
            crows[tag] = measure(fn())
            print(f"{cname} {tag}: {crows[tag]}")
        results[cname] = {
            "n": n, "nlist": nlist,
            "auto_nprobe": auto_np, "auto_refine_mult": auto_rm,
            "configs": crows,
        }

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"\nwrote {args.out}\n")
    # markdown for SCALE.md
    for cname, r in results.items():
        print(f"### {cname} (n={r['n']}, nlist={r['nlist']}, "
              f"auto nprobe={r['auto_nprobe']}, auto refine={r['auto_refine_mult']})")
        print("| config | id-recall@3 | effective recall |")
        print("|---|---|---|")
        for tag, m in r["configs"].items():
            print(f"| {tag} | {m['id_recall']} | {m['eff_recall']} |")
        print()
    spark.stop()


if __name__ == "__main__":
    main()
