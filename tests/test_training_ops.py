"""Semantic invariants for the round-4 training-pipeline operators —
properties the DuckDB parity check can't express (both engines could be
wrong the same way)."""

from __future__ import annotations

from pyspark.sql import functions as F

from experts_etl_spark.llm.queries import QUERIES
from tests.conftest import SF_CORRECT


def test_train_val_split_fractions_and_stability(spark):
    out = QUERIES["train_val_split"](spark, SF_CORRECT)
    n = out.count()
    frac = {
        r["split"]: r["c"] / n
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # hash buckets are uniform-ish: 90/5/5 within a few points at n=500
    assert 0.84 <= frac["train"] <= 0.96, frac
    assert 0.01 <= frac["val"] <= 0.10, frac
    assert 0.01 <= frac["test"] <= 0.10, frac
    # deterministic: two runs assign every doc identically
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in QUERIES["train_val_split"](spark, SF_CORRECT).collect()
    }
    assert a == b


def test_sequence_packing_bins_are_contiguous_and_bounded(spark):
    rows = QUERIES["sequence_packing"](spark, SF_CORRECT).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, docs in by_lang.items():
        docs.sort(key=lambda r: r["doc_id"])
        # bin ids are non-decreasing along the stream (contiguity)
        bins = [r["bin_id"] for r in docs]
        assert bins == sorted(bins), lang
        # each bin's token sum stays under budget + one overflow doc
        max_doc = max(r["n_tokens"] for r in docs)
        sums: dict[int, int] = {}
        for r in docs:
            sums[r["bin_id"]] = sums.get(r["bin_id"], 0) + r["n_tokens"]
        for b, s in sums.items():
            assert s <= 2048 + max_doc, (lang, b, s)


def test_stratified_sample_size_and_determinism(spark):
    out = QUERIES["stratified_sample"](spark, SF_CORRECT)
    per = {
        r["lang"]: r["c"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert all(c <= 20 for c in per.values()), per
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"] for r in QUERIES["stratified_sample"](spark, SF_CORRECT).collect()
    )
    assert a == b


def test_contamination_pairs_never_within_one_side(spark):
    """Every reported pair straddles the train/benchmark boundary."""
    rows = QUERIES["benchmark_contamination"](spark, SF_CORRECT).collect()
    for r in rows:
        assert r["bench_doc_id"] % 11 == 0
        assert r["train_doc_id"] % 11 != 0
        assert 0.0 < r["overlap_ratio"] <= 1.0


def test_sampled_leakage_estimator_survival_logic(spark):
    """training_dedup_leakage_sampled's Horvitz-Thompson estimator rests
    on one fact: a pair appears in the sampled audit iff BOTH endpoints
    hash into the sample (survival probability p²) — hence
    est = observed / p².  Pin it: exact pairs mined within the sampled
    subset must equal the full-population exact pairs restricted to
    sampled endpoints, and the registered query must scale observed by
    exactly 1/p² = 4."""
    from pyspark.sql import functions as F

    from experts_etl_spark.llm.dedup import hex60, ngram_jaccard_pairs
    from experts_etl_spark.llm.queries import QUERIES
    from experts_etl_spark.sources import read_table
    from tests.conftest import SF_SMOKE

    d = read_table(spark, SF_SMOKE, "documents")
    in_sample = hex60(F.col("doc_id").cast("string")) % 2 == 0
    samp = d.filter(in_sample)
    sampled_ids = {r[0] for r in samp.select("doc_id").collect()}
    # truth over the population, then restricted to sampled endpoints
    truth = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(d, "text", "doc_id", 0.5).collect()
    }
    truth_in_sample = {
        (a, b) for a, b in truth if a in sampled_ids and b in sampled_ids
    }
    mined = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(samp, "text", "doc_id", 0.5).collect()
    }
    assert mined == truth_in_sample
    assert 0 < len(sampled_ids) < d.count()  # the sample is non-trivial
    row = QUERIES["training_dedup_leakage_sampled"](spark, SF_SMOKE).collect()[0]
    assert row["est_leaked_pairs"] == row["leaked_pairs_sampled"] * 4.0
    assert 0 < row["n_sampled"] < row["n_kept"] + 1
