#!/usr/bin/env python
"""Two-point scale fit for the dedup/ANN pack (VERDICT r3 item 9).

Generates 1× and 3× LLM-pack inputs from ONE deterministic generator
(tools/gen_scaledata.py) and times each pack query at both sizes —
min-of-three-warm-runs, same estimator as bench.py.  The printed ratio
is the empirical cost exponent evidence: a blocked/linear operator
should land near 3× (data grew 3×); an accidentally quadratic one
shows ~9×.  Queries fail independently (bench.py's isolation rule): a
broken query records an error and the rest of the fit survives.

Usage: python tools/scale_fit.py [--out SCALE_FIT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PACK = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_winnow",
    "embedding_near_dup_bucketed",
    "ann_topk_bucketed",
    "ann_topk_ivf_refined",
    "ann_ivf_kmeans",
    "text_quality_metrics",
    "lang_id_heuristic",
    "token_count_by_lang",
    "corpus_curation",
    "train_val_split",
    "benchmark_contamination",
    "tfidf_topk_terms",
    "sequence_packing",
    "stratified_sample",
    # corpus-curation pack (round 4, second wave)
    "dedup_cluster_resolution",
    "pii_redaction",
    "repetition_metrics",
    "domain_mixture_sample",
    "training_corpus_pipeline",
    "dedup_incremental_ingest",
    "dedup_lsh_recall",
    "vocab_topk",
    "encode_token_ids",
    "multimodal_dedup",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--docs1", type=int, default=5000)
    ap.add_argument("--vecs1", type=int, default=2000)
    args = ap.parse_args()

    from experts_etl_spark.plans.registry import QUERIES
    from experts_etl_spark.session import get_spark
    from tools.gen_scaledata import generate

    spark = get_spark("scale_fit")
    root = tempfile.mkdtemp(prefix="scale_fit_")
    dirs = {}
    for mult in (1, 3):
        d = f"{root}/x{mult}"
        generate(d, docs=args.docs1 * mult, vecs=args.vecs1 * mult, seed=42, mode="uniform")
        dirs[mult] = d

    results: dict[str, dict] = {}
    for name in PACK:
        fn = QUERIES[name]
        row = {}
        try:
            for mult, d in dirs.items():
                fn(spark, d).count()  # warm codegen/broadcast
                times = []
                for _ in range(3):
                    t0 = time.time()
                    fn(spark, d).count()
                    times.append(time.time() - t0)
                row[f"t{mult}x"] = round(min(times), 3)
            row["ratio"] = (
                round(row["t3x"] / row["t1x"], 2) if row["t1x"] > 0 else None
            )
            print(
                f"{name:32s} 1x={row['t1x']:7.3f}s 3x={row['t3x']:7.3f}s"
                f" ratio={row['ratio']}"
            )
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{name:32s} ERR {row['err']}")
        finally:
            spark.catalog.clearCache()
        results[name] = row

    out = {
        "docs_1x": args.docs1,
        "vecs_1x": args.vecs1,
        "queries": results,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
