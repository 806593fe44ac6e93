#!/usr/bin/env python
"""Measure the PQ WRITE-knob surface (r10 verdict next #6): recon
error, id-recall, train+encode cost, and bytes/vector across the
codebook size ``k`` and subvector count ``m`` grids, marking where the
self-scaling defaults (``auto_pq_k`` / ``auto_pq_m``) land.

The read-knob sweep (tools/pq_knob_sweep.py) ran at the sf0.1 corpus
(2,000 vectors), where auto_pq_k still gives the legacy 64 — the k
rule only bites past 2^12 vectors — so this sweep uses a LARGER
clustered fixture (the 27× scale corpus, 54,000 vectors) where the
rule hits its 256 cap, and answers: does capping at the FAISS 8-bit
256 sit on the recall/compression knee, and is dsub≈16 (auto_pq_m)
the right split?

Writes PQ_WRITE_KNOB_SWEEP.json and prints a markdown table for
SCALE.md.

Usage: python tools/pq_write_knob_sweep.py [--out PQ_WRITE_KNOB_SWEEP.json]
       [--vecs 54000] [--mode clustered]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PQ_WRITE_KNOB_SWEEP.json")
    ap.add_argument("--vecs", type=int, default=54000)
    ap.add_argument("--mode", choices=["uniform", "clustered"],
                    default="clustered")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from experts_etl_spark.llm.pq import (
        auto_pq_k,
        auto_pq_m,
        pq_adc_topk,
        pq_recon_ppm,
        pq_train,
    )
    from experts_etl_spark.llm.similarity import ann_exact_truth
    from experts_etl_spark.session import get_spark
    from tools.gen_scaledata import generate

    spark = get_spark("pq_write_knob_sweep")
    root = tempfile.mkdtemp(prefix="pq_wks_")
    generate(root, docs=100, vecs=args.vecs, seed=42, mode=args.mode)
    emb = spark.read.parquet(f"{root}/embeddings.parquet").localCheckpoint()
    n = emb.count()
    dim = emb.select(F.size("embedding")).first()[0]
    probes = emb.filter(F.col("vec_id") < 16)
    truth = ann_exact_truth(
        emb, "vec_id", "embedding", probe_max=16, k=3, cache_key=root
    ).localCheckpoint()
    possible = truth.count()
    k_auto, m_auto = auto_pq_k(n), auto_pq_m(dim)
    print(f"n={n} dim={dim} auto_k={k_auto} auto_m={m_auto}")

    def measure(m: int, k: int) -> dict:
        code_mod = max(2, n // k)
        t0 = time.time()
        subs, books = pq_train(emb, "vec_id", "embedding", m=m,
                               code_mod=code_mod, iters=2)
        books = books.localCheckpoint()
        train_s = time.time() - t0
        ppm = pq_recon_ppm(emb, books, "vec_id", "embedding", m=m)
        # flat-ADC id-recall@3 on the fixed probes (refine pinned so the
        # write knobs are the only variable)
        topk = pq_adc_topk(
            emb, probes, "vec_id", "embedding", k=3, m=m,
            code_mod=code_mod, iters=2, refine_mult=8,
        )
        hits = truth.join(
            topk.select("probe_id", "cand_id"), ["probe_id", "cand_id"]
        ).count()
        row = {
            "m": m,
            "k": k,
            "bytes_per_vec": round(m * math.log2(k) / 8 + 8, 2),
            "recon_ppm": ppm,
            "id_recall": round(hits / possible, 3),
            "train_s": round(train_s, 2),
            "auto": (m == m_auto and k == k_auto),
        }
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return row

    rows = []
    for k in (16, 32, 64, 128, 256, 512):
        rows.append(measure(m_auto, k))
        print(rows[-1], flush=True)
    for m in (2, 8, 16):
        if dim % m == 0:
            rows.append(measure(m, k_auto))
            print(rows[-1], flush=True)

    out = {
        "n_vecs": n,
        "dim": dim,
        "mode": args.mode,
        "auto_k": k_auto,
        "auto_m": m_auto,
        "note": "k grid at m=auto, then m grid at k=auto; recall is "
                "flat-ADC id-recall@3 at pinned refine_mult=8; 512 "
                "exceeds the auto cap (shown to locate the knee)",
        "rows": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print("| m | k | B/vec | recon ppm | id-recall@3 | train s | auto |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['m']} | {r['k']} | {r['bytes_per_vec']} | "
            f"{r['recon_ppm']} | {r['id_recall']} | {r['train_s']} | "
            f"{'**auto**' if r['auto'] else ''} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
