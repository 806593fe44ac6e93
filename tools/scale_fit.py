#!/usr/bin/env python
"""Multi-point scale fit for the dedup/ANN pack (VERDICT r3 item 9;
third decade point added per VERDICT r4 item 3 — superlinear terms
hide at 3×).

Generates 1×/3×/9× LLM-pack inputs from ONE deterministic generator
(tools/gen_scaledata.py) and times each pack query at every size —
min-of-three-warm-runs, same estimator as bench.py.  ``ratio3``/
``ratio9`` are the empirical cost growth vs 1× (ideal = the data
growth, 3 and 9); ``exp`` is the fitted log-log slope across all
points — a blocked/linear operator lands near 1.0, an accidentally
quadratic one near 2.0.  Queries fail independently (bench.py's
isolation rule): a broken query records an error and the rest of the
fit survives.

Usage: python tools/scale_fit.py [--out SCALE_FIT.json] [--mults 1,3,9]
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
    # round-5 additions
    "training_dedup_leakage",
    "curation_stream_routing",
    "span_dedup",
    "ann_topk_ivf2",
    "dedup_cluster_resolution_lsh",
    # round-6 additions
    "ann_topk_ivf2_refined",
    "training_dedup_leakage_sampled",
    # round-8 additions: sampled scale paths now gated
    "ann_ivf_kmeans_sampled",
    "dedup_lsh_recall_sampled",
    # production p = 1/8 sampling point — measured against the exact
    # audit's row to demonstrate the ~p² cost win (r7 verdict item 7)
    "training_dedup_leakage_sampled_p8",
    # round-8 additions: product quantization (llm/pq.py) + SemDeDup
    "ann_pq_codes",
    "ann_topk_pq_adc",
    "ann_topk_ivfpq",
    "embedding_semantic_dedup",
    # round-11 additions
    "curation_tick_pipeline",
    "ann_recall_sampled",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--docs1", type=int, default=5000)
    ap.add_argument("--vecs1", type=int, default=2000)
    ap.add_argument("--mults", default="1,3,9")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: whole PACK); "
                         "names outside PACK are allowed for ad-hoc fits")
    ap.add_argument("--merge", action="store_true",
                    help="with --out and --only: merge rows into the existing "
                         "file instead of overwriting it")
    ap.add_argument("--corpus", choices=["fixed", "heaps"], default="fixed",
                    help="documents fixture family: 'fixed' = the original "
                         "2000-word vocab; 'heaps' = Heaps'-law vocabulary "
                         "growth (scale-invariant duplication)")
    ap.add_argument("--vec-mode", choices=["uniform", "clustered",
                    "clustered_scaled"], default="uniform",
                    help="embeddings fixture family: 'uniform' = the "
                         "worst-case near-uniform vectors; "
                         "'clustered_scaled' = sqrt(n) Gaussian clusters "
                         "(the realistic scale series for ANN audits)")
    ap.add_argument("--row-suffix", default=None,
                    help="suffix appended to result row names (e.g. '@heaps') "
                         "so variant-fixture rows merge alongside the "
                         "canonical ones instead of overwriting them")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    assert mults[0] == 1, "the first multiplier must be the 1x base"

    import math

    from experts_etl_spark.plans.registry import QUERIES
    from experts_etl_spark.session import get_spark
    from tools.gen_scaledata import generate

    spark = get_spark("scale_fit")
    root = tempfile.mkdtemp(prefix="scale_fit_")
    dirs = {}
    for mult in mults:
        d = f"{root}/x{mult}"
        generate(
            d,
            docs=args.docs1 * mult,
            vecs=args.vecs1 * mult,
            seed=42,
            mode=args.vec_mode,
            corpus=args.corpus,
        )
        dirs[mult] = d

    pack = args.only.split(",") if args.only else PACK
    results: dict[str, dict] = {}
    for name in pack:
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
                # Residue GC per MULT, not only per query: queries that
                # localCheckpoint (the dedup/ANN pack) leave block-manager
                # entries per run; after 4 runs each at the smaller mults
                # the larger mults measure under that accumulated storage
                # pressure.  Observed round 8: dedup_ngram_jaccard's 9×
                # point measured 19.6s inside the loop vs 11.0s COLD in a
                # fresh JVM — the "superlinear knee" was the harness, not
                # the operator.
                spark.catalog.clearCache()
                import gc as _gc

                _gc.collect()
                spark.sparkContext._jvm.System.gc()
            if row["t1x"] > 0:
                for mult in mults[1:]:
                    row[f"ratio{mult}"] = round(row[f"t{mult}x"] / row["t1x"], 2)
                # Fitted log-log slope over all points (least squares
                # through the measured (log mult, log time) pairs):
                # ~1.0 = linear in data, ~2.0 = quadratic.
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
            print(
                f"{name:32s} "
                + " ".join(f"{m}x={row[f't{m}x']:7.3f}s" for m in mults)
                + f" exp={row.get('exp')}"
            )
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{name:32s} ERR {row['err']}")
        finally:
            # Same residue discipline as bench.py: clearCache drops
            # JVM cache-manager entries, but localCheckpoint blocks are
            # only reclaimed after the Python refs die AND the JVM GCs —
            # without the explicit GCs each query runs under the
            # accumulated storage pressure of every query before it
            # (measured: the funnel family inflated 1.3-3× late in the
            # suite, corrupting the very exponents this tool measures).
            spark.catalog.clearCache()
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        results[name + (args.row_suffix or "")] = row

    # Per-row ``run`` records are the ONLY authoritative statement of
    # what a row was measured under — merged files accumulate rows from
    # many invocations with different mults/generator params, so a
    # top-level ``mults`` would misrepresent most of them (it did,
    # r9 verdict Wrong #1: header said [1,3,9] while every row ran
    # [1,3,9,27]).  No top-level mults field; stamp every row instead.
    run_meta = {
        "mults": mults,
        "docs_1x": args.docs1,
        "vecs_1x": args.vecs1,
        "corpus": args.corpus,
    }
    for row in results.values():
        row["run"] = dict(run_meta)
    out = {
        "note": "per-query 'run' records are authoritative for "
        "mults and generator params; rows merge across invocations",
        "queries": results,
    }
    if args.out:
        if args.merge and os.path.exists(args.out):
            with open(args.out) as fh:
                prev = json.load(fh)
            prev.pop("mults", None)  # retire the misleading header
            # Older-format files also carried per-run generator params
            # at the top level; the per-row 'run' records are
            # authoritative, so drop these too (r10 ADVICE).
            prev.pop("docs_1x", None)
            prev.pop("vecs_1x", None)
            prev["note"] = out["note"]
            prev.setdefault("queries", {}).update(results)
            out = prev
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
