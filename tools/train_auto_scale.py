#!/usr/bin/env python
"""Measure the TRAIN_AUTO_MIN self-selection crossing (r8 verdict,
missing #3 / next-round #5).

Every prior SCALE_FIT point tops out at 27× = 54,000 vectors — below
the 65,536-vector threshold where ``_kmeans_train``'s DEFAULT
(``train_mod=None``) switches from full-corpus Lloyd training to the
√n-proportional sample — so the production self-selection was proven
by unit test (tests/test_train_auto_threshold.py) but never measured
in a scale fit.  This tool times the DEFAULT path at 1/3/9/27/33×
(33× = 66,000 vectors, just across the threshold) and verifies oracle
agreement at every point with the threshold-aware oracle choice the
unit test pins, generalized to the fit harness:

* n ≤ TRAIN_AUTO_MIN → the default trains FULL → compare against the
  registered ``ann_ivf_kmeans`` oracle (full Lloyd twin);
* n > TRAIN_AUTO_MIN → the default self-selects SAMPLED training →
  compare against the registered ``ann_ivf_kmeans_sampled`` oracle
  (the integer-exact √n-sample twin).

The expected shape: cost grows ~n·√n through 27× (full training, the
measured exp≈1.1 family), then the 33× point lands BELOW the n^1.5
extrapolation — often below the 27× point — because training flips to
the linear sampled path while final assignment stays full-corpus.
Rows merge into SCALE_FIT.json as ``ann_ivf_kmeans_default`` with an
``oracle_ok`` flag per point.

Usage: python tools/train_auto_scale.py [--out SCALE_FIT.json]
       [--mults 1,3,9,27,33] [--vecs1 2000] [--skip-oracle-below 27]
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
    ap.add_argument("--out", default=None)
    ap.add_argument("--vecs1", type=int, default=2000)
    ap.add_argument("--mults", default="1,3,9,27,33")
    ap.add_argument(
        "--skip-oracle-below",
        type=int,
        default=0,
        help="skip the DuckDB comparison for mults below this (the "
        "small points are already driver/pytest-gated; the large "
        "cross-joins are the expensive legs)",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    import duckdb

    from experts_etl_spark.llm.similarity import (
        TRAIN_AUTO_MIN,
        kmeans_refined_assign,
    )
    from experts_etl_spark.plans.registry import _ALL_ORACLES
    from experts_etl_spark.session import get_spark
    from tests.oracle_utils import compare_spark_duckdb
    from tools.gen_scaledata import generate

    spark = get_spark("train_auto_scale")
    root = tempfile.mkdtemp(prefix="train_auto_")
    row: dict = {}
    for mult in mults:
        d = f"{root}/x{mult}"
        n = args.vecs1 * mult
        generate(d, docs=50, vecs=n, seed=42, mode="uniform")
        e = spark.read.parquet(f"{d}/embeddings.parquet")

        def run():
            return kmeans_refined_assign(
                e, "vec_id", "embedding", iters=2, train_mod=None
            )

        run().count()  # warm
        times = []
        for _ in range(3):
            t0 = time.time()
            run().count()
            times.append(time.time() - t0)
        row[f"t{mult}x"] = round(min(times), 3)
        sampled = n > TRAIN_AUTO_MIN
        oracle_name = (
            "ann_ivf_kmeans_sampled" if sampled else "ann_ivf_kmeans"
        )
        if mult >= args.skip_oracle_below:
            con = duckdb.connect()
            try:
                con.execute(
                    "CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{d}/embeddings.parquet')"
                )
                compare_spark_duckdb(run(), con, _ALL_ORACLES[oracle_name])
                row[f"oracle_ok_{mult}x"] = oracle_name
            finally:
                con.close()
        print(
            f"x{mult:3d}  n={n:6d}  t={row[f't{mult}x']:7.3f}s  "
            f"path={'sampled' if sampled else 'full'}  "
            f"oracle={row.get(f'oracle_ok_{mult}x', 'skipped')}"
        )
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    if row.get("t1x"):
        for mult in mults[1:]:
            row[f"ratio{mult}"] = round(row[f"t{mult}x"] / row["t1x"], 2)
        # Fit the exponent over the PRE-threshold mults only: pooling
        # the post-crossing points would blend two cost regimes (full
        # n^1.5 training vs linear sampled training) and understate
        # the pre-threshold exponent the fit is supposed to report.
        # Post-threshold points are the crossing evidence; they're
        # reported separately under "crossing".
        pre = [m for m in mults if args.vecs1 * m <= TRAIN_AUTO_MIN]
        post = [m for m in mults if args.vecs1 * m > TRAIN_AUTO_MIN]
        pts = [
            (math.log(m), math.log(row[f"t{m}x"]))
            for m in pre
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
        if post:
            row["crossing"] = {
                f"t{m}x": row[f"t{m}x"] for m in post
            }
            row["crossing"]["note"] = (
                "post-TRAIN_AUTO_MIN points (auto-sampled training "
                "regime); excluded from exp, which fits the full-"
                "training regime only"
            )
    row["run"] = {
        "mults": mults,
        "exp_fit_mults": [m for m in mults if args.vecs1 * m <= TRAIN_AUTO_MIN],
        "vecs_1x": args.vecs1,
        "train_auto_min": TRAIN_AUTO_MIN,
        "tool": "train_auto_scale.py",
    }
    print(json.dumps({"ann_ivf_kmeans_default": row}))
    if args.out:
        if os.path.exists(args.out):
            with open(args.out) as fh:
                prev = json.load(fh)
            prev.setdefault("queries", {})
        else:
            prev = {"queries": {}}
        prev["queries"]["ann_ivf_kmeans_default"] = row
        with open(args.out, "w") as fh:
            json.dump(prev, fh, indent=1)
        print(f"merged into {args.out}")


if __name__ == "__main__":
    main()
