"""Semantic invariants for the corpus-curation operators
(llm/curation.py) — properties the DuckDB parity check can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from experts_etl_spark.llm.curation import (
    connected_components,
    domain_mixture_sample,
    redact_pii,
    repetition_metrics,
    resolve_clusters,
)
from experts_etl_spark.llm.queries import QUERIES
from tests.conftest import SF_CORRECT


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3 > one propagation round), pair 10-11,
    # and a triangle 20-21-22 — all must collapse to their min ids.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id1 int, id2 int",
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_resolve_clusters_sizes_and_canonicals(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id1 int, id2 int"
    )
    rows = {r["doc_id"]: r for r in resolve_clusters(edges).collect()}
    assert rows[1]["cluster_size"] == 4 and rows[1]["is_canonical"]
    assert rows[4]["canonical_id"] == 1 and not rows[4]["is_canonical"]
    assert rows[11]["canonical_id"] == 10 and rows[10]["cluster_size"] == 2
    # exactly one canonical per cluster
    assert sum(r["is_canonical"] for r in rows.values()) == 2


def test_cluster_resolution_consistent_with_pairs(spark):
    # every pair endpoint lands in the same component as its partner
    from experts_etl_spark.llm.dedup import ngram_jaccard_pairs
    from experts_etl_spark.sources import read_table

    d = read_table(spark, SF_CORRECT, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", 0.5)
    clusters = QUERIES["dedup_cluster_resolution"](spark, SF_CORRECT)
    lab = {r["doc_id"]: r["canonical_id"] for r in clusters.collect()}
    for p in pairs.collect():
        assert lab[p["id1"]] == lab[p["id2"]], p
    # canonical ids are cluster minima
    for doc, comp in lab.items():
        assert comp <= doc


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo-bar.org now"),
            (2, "ssn 123-45-6789 phone 555-123-4567"),
            (3, "ip 10.0.0.255 ok"),
            (4, "nothing here 12-34"),
        ],
        "id int, text string",
    )
    red, counts = redact_pii(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            red.alias("t"),
            counts["email"].alias("e"),
            counts["ssn"].alias("s"),
            counts["phone"].alias("p"),
            counts["ip"].alias("i"),
        ).collect()
    }
    assert rows[1]["t"] == "mail [EMAIL] now" and rows[1]["e"] == 1
    assert rows[2]["t"] == "ssn [SSN] phone [PHONE]"
    assert (rows[2]["s"], rows[2]["p"]) == (1, 1)
    assert rows[3]["t"] == "ip [IP] ok" and rows[3]["i"] == 1
    assert rows[4]["t"] == "nothing here 12-34"
    assert (rows[4]["e"], rows[4]["s"], rows[4]["p"], rows[4]["i"]) == (0, 0, 0, 0)


def test_repetition_metrics_known_doc(spark):
    df = spark.createDataFrame(
        [(1, "a a a a b"), (2, "q r s t u v w x y z")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df, "text", "doc_id").collect()}
    r1 = rows[1]
    assert r1["n_words"] == 5 and r1["n_distinct"] == 2
    assert abs(r1["top_word_frac"] - 0.8) < 1e-12
    assert abs(r1["top_bigram_frac"] - 0.75) < 1e-12  # "a a" 3 of 4
    assert r1["repetitive"]
    r2 = rows[2]
    # 10 unique words: top word 1/10, top bigram 1/9 — under both thresholds
    assert r2["n_distinct"] == 10 and not r2["repetitive"]


def test_domain_mixture_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 2}") for i in range(200)], "doc_id int, source string"
    )
    # weight d0=1, d1=3 → shares 25%/75%; rates = min(1, share*N/n_dom)
    weight = F.when(F.col("source") == "d0", 1).otherwise(3)
    out = domain_mixture_sample(df, "doc_id", "source", weight)
    rates = {r["source"]: r["rate"] for r in out.select("source", "rate").distinct().collect()}
    assert abs(rates["d0"] - 0.5) < 1e-12  # 0.25*200/100
    assert rates["d1"] == 1.0
    # acceptance is deterministic and close to the rate at n=100/domain
    kept = {
        r["source"]: r["c"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert kept["d1"] == 100
    assert 35 <= kept["d0"] <= 65
    again = domain_mixture_sample(df, "doc_id", "source", weight)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_curation_ops_tolerate_null_and_empty_text(spark):
    """100 TB corpora carry nulls and empties; none of the curation ops
    may crash on them, and each one's drop/keep behavior is pinned."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real words here ok")],
        "doc_id int, text string",
    )
    rep = {r["doc_id"]: r for r in repetition_metrics(df, "text", "doc_id").collect()}
    # null text explodes to nothing -> doc absent; empty/whitespace text
    # splits to [""] -> one empty-string token, never a crash
    assert 1 not in rep
    assert rep[2]["n_words"] == 1 and rep[4]["n_words"] == 4

    red, counts = redact_pii(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select("doc_id", red.alias("t"), counts["email"].alias("e")).collect()
    }
    assert rows[1]["t"] is None and rows[1]["e"] is None  # null propagates
    assert rows[2]["t"] == "" and rows[2]["e"] == 0

    from experts_etl_spark.llm.dedup import incremental_lsh_dedup, ngram_jaccard_pairs

    # shingle-based ops: docs under 3 tokens (incl. null/empty) produce
    # no shingles and silently drop from pair mining — no crash
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", 0.1)
    assert pairs.count() == 0

    inc = incremental_lsh_dedup(
        df.filter(F.col("doc_id") < 3), df.filter(F.col("doc_id") >= 3),
        "text", "doc_id", 0.1,
    )
    assert inc.count() == 0


def test_incremental_ingest_matches_full_selfjoin_slice(spark):
    """Asymmetric new-vs-index dedup must find exactly the full
    self-join's pairs that straddle the split (same bands, same verify):
    no pair invented, none lost at the boundary."""
    from experts_etl_spark.llm.dedup import incremental_lsh_dedup, minhash_lsh_dedup
    from experts_etl_spark.sources import read_table

    d = read_table(spark, SF_CORRECT, "documents")
    full = {
        (min(r["id1"], r["id2"]), max(r["id1"], r["id2"]))
        for r in minhash_lsh_dedup(d, "text", "doc_id", 0.5).collect()
        if (r["id1"] % 10 == 7) != (r["id2"] % 10 == 7)
    }
    inc = {
        (min(r["new_id"], r["index_id"]), max(r["new_id"], r["index_id"]))
        for r in incremental_lsh_dedup(
            d.filter(F.col("doc_id") % 10 != 7),
            d.filter(F.col("doc_id") % 10 == 7),
            "text", "doc_id", 0.5,
        ).collect()
    }
    assert inc == full


def test_incremental_ingest_signature_store_reuse(spark):
    """A persisted signature table (the signature-store path) must give
    identical pairs to deriving the index signatures from the raw
    documents — and the API must refuse a call with neither input or a
    malformed store."""
    import pytest

    from experts_etl_spark.llm.dedup import (
        incremental_lsh_dedup,
        signature_shingle_sets,
    )
    from experts_etl_spark.sources import read_table

    d = read_table(spark, SF_CORRECT, "documents")
    index = d.filter(F.col("doc_id") % 10 != 7)
    new = d.filter(F.col("doc_id") % 10 == 7)
    derived = {
        (r["new_id"], r["index_id"])
        for r in incremental_lsh_dedup(
            index, new, "text", "doc_id", 0.5
        ).collect()
    }
    store = signature_shingle_sets(index, "text", "doc_id")
    reused = {
        (r["new_id"], r["index_id"])
        for r in incremental_lsh_dedup(
            None, new, "text", "doc_id", 0.5, index_signatures=store
        ).collect()
    }
    assert reused == derived and len(reused) > 0
    with pytest.raises(ValueError, match="index_df or index_signatures"):
        incremental_lsh_dedup(None, new, "text", "doc_id", 0.5)
    with pytest.raises(ValueError, match="signature_shingle_sets layout"):
        incremental_lsh_dedup(
            None, new, "text", "doc_id", 0.5,
            index_signatures=store.drop("sh"),
        )


def test_route_documents_gate_aware_dedup_election(spark):
    """Two copies sharing a fingerprint (fp is whitespace/case
    normalized) that straddle the quality gate: the GATE-SURVIVING copy
    must be kept even when the failing copy has the smaller doc_id.
    Ranked by doc_id alone, the low-quality copy would win the dedup
    window ('low_quality') and shadow the passing copy ('duplicate') —
    losing the content entirely."""
    from experts_etl_spark.streaming.curation import route_documents

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa the of"
    compact = words                      # short raw text → quality < 0.5
    padded = words + " " * 320           # same words → same fp; longer → ≥ 0.5
    df = spark.createDataFrame(
        [(1, compact, "en", "s0"), (2, padded, "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r["doc_id"]: r for r in route_documents(df).collect()}
    assert rows[1]["fp"] == rows[2]["fp"]          # the scenario is real
    assert rows[1]["quality"] < 0.5 <= rows[2]["quality"]
    assert rows[1]["reject_reason"] == "low_quality"
    assert rows[2]["reject_reason"] is None        # kept, not 'duplicate'
    assert not rows[2]["dup_in_batch"]


def test_span_dedup_removes_boilerplate_blocks(spark):
    """Aligned 10-word blocks shared by >2 docs are cut; unique content
    survives in order; a fully-boilerplate doc yields clean_text=''."""
    from experts_etl_spark.llm.curation import span_dedup

    boiler = "terms of service apply all rights reserved contact us here"
    uniq = [
        f"document {i} body word{i}a word{i}b word{i}c word{i}d word{i}e word{i}f word{i}g"
        for i in range(4)
    ]
    rows = [(i, boiler + " " + uniq[i]) for i in range(3)]  # boiler df=4 > 2
    rows.append((3, uniq[3] + " " + boiler))
    rows.append((4, boiler))                                # all boilerplate
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dedup(df, "text", "doc_id").collect()}
    for i in range(3):
        assert got[i]["n_spans"] == 2 and got[i]["n_removed"] == 1
        assert got[i]["clean_text"] == uniq[i]
    assert got[3]["clean_text"] == uniq[3]     # order preserved, block cut
    assert got[4]["n_removed"] == 1 and got[4]["clean_text"] == ""


def test_span_dedup_identity_when_cap_unreachable(spark):
    """With an unreachably high frequency cap nothing is removed:
    clean_text reconstructs the whitespace/case-normalized original for
    every document — the chunk/reassemble round-trip is lossless."""
    from experts_etl_spark.llm.curation import span_dedup
    from experts_etl_spark.llm.text import words
    from experts_etl_spark.sources import read_table

    d = read_table(spark, SF_CORRECT, "documents").limit(50)
    got = span_dedup(d, "text", "doc_id", max_sf=10**9)
    norm = d.select(
        "doc_id", F.array_join(words(F.col("text")), " ").alias("norm")
    )
    diff = (
        got.join(norm, "doc_id")
        .filter(
            (F.col("clean_text") != F.col("norm"))
            | (F.col("n_removed") != 0)
        )
        .count()
    )
    assert diff == 0


def test_funnel_lsh_miner_matches_exact_at_test_scale(spark):
    """The curation funnel's default pair miner is the MinHash-LSH
    candidate path (scale default).  This pins its recall against the
    exact shingle-blocked miner over the funnel's own gated survivor
    set at sf0.01: identical pair sets, hence identical dup-loser sets
    and identical kept corpora — the measured evidence behind
    training_dedup_leakage's leaked_pairs = 0."""
    from experts_etl_spark.llm.dedup import (
        minhash_lsh_dedup,
        ngram_jaccard_pairs,
    )
    from experts_etl_spark.llm.queries import _curation_funnel

    gated, _ = _curation_funnel(spark, SF_CORRECT)
    exact = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(gated, "text", "doc_id", 0.5).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_dedup(gated, "text", "doc_id", 0.5).collect()
    }
    assert lsh == exact


def test_substring_dedup_catches_unaligned_boilerplate(spark):
    """The defining case vs span_dedup: the same 6-word boilerplate
    phrase at DIFFERENT word offsets in three documents.  Aligned
    10-word blocks differ (the phrase straddles block boundaries at
    different positions) so span_dedup removes nothing; the sliding
    5-word windows match at every offset and substring_dedup cuts the
    phrase from all three docs, leaving unique content in order."""
    from experts_etl_spark.llm.curation import span_dedup, substring_dedup

    boiler = "all rights reserved contact us here"  # 6 words
    docs = [
        (0, boiler + " alpha bravo charlie delta echo"),
        (1, "foxtrot golf " + boiler + " hotel india"),
        (2, "juliet kilo lima mike november " + boiler),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in substring_dedup(df, "text", "doc_id").collect()
    }
    # 6-word repeat = two overlapping hot 5-windows; union covers all 6
    assert got[0]["n_removed"] == 6 and got[0]["clean_text"] == (
        "alpha bravo charlie delta echo"
    )
    assert got[1]["n_removed"] == 6 and got[1]["clean_text"] == (
        "foxtrot golf hotel india"
    )
    assert got[2]["n_removed"] == 6 and got[2]["clean_text"] == (
        "juliet kilo lima mike november"
    )
    # span_dedup's aligned blocks miss the offset-shifted repeat
    aligned = {
        r["doc_id"]: r for r in span_dedup(df, "text", "doc_id").collect()
    }
    assert all(aligned[i]["n_removed"] == 0 for i in range(3))


def test_substring_dedup_identity_when_cap_unreachable(spark):
    """With an unreachable frequency cap the window/anti-join/reassembly
    round-trip is lossless against the normalized original."""
    from experts_etl_spark.llm.curation import substring_dedup
    from experts_etl_spark.llm.text import words
    from experts_etl_spark.sources import read_table

    d = read_table(spark, SF_CORRECT, "documents").limit(50)
    got = substring_dedup(d, "text", "doc_id", max_sf=10**9)
    norm = d.select(
        "doc_id", F.array_join(words(F.col("text")), " ").alias("norm")
    )
    diff = (
        got.join(norm, "doc_id")
        .filter(
            (F.col("clean_text") != F.col("norm"))
            | (F.col("n_removed") != 0)
        )
        .count()
    )
    assert diff == 0


def test_substring_dedup_short_docs_and_within_doc_repeats(spark):
    """Documents shorter than the window produce no windows and pass
    through untouched; a window repeated 3x WITHIN one document counts
    toward the corpus threshold exactly like cross-document repeats
    (frequency is occurrence-counted, not document-counted)."""
    from experts_etl_spark.llm.curation import substring_dedup

    rep = "one two three four five"  # 5 words, one window per occurrence
    docs = [
        (0, "tiny doc"),                        # < window, untouched
        (1, f"{rep} x {rep} y {rep}"),          # 3 in-doc occurrences
        (2, "unrelated words entirely here now six"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in substring_dedup(df, "text", "doc_id").collect()
    }
    assert got[0]["n_removed"] == 0 and got[0]["clean_text"] == "tiny doc"
    assert got[1]["n_removed"] == 15 and got[1]["clean_text"] == "x y"
    assert got[2]["n_removed"] == 0


def test_substring_incremental_equals_full_on_straddling_slice(spark):
    """THE incremental-ingest contract (r9 verdict missing #2): clean
    the batch against the archive's window store and you get, for
    every batch document, byte-equal rows to the FULL corpus-wide rule
    over archive ∪ batch — store counts + batch counts sum to exactly
    the corpus-wide frequency the full rule thresholds on.  Uses the
    sf0.01 corpus and the registered %10 batch split, so windows that
    straddle the split (hot only via archive+batch together) are
    exercised for real."""
    from experts_etl_spark.llm.curation import (
        substring_dedup,
        substring_dedup_incremental,
        substring_window_store,
    )
    from experts_etl_spark.sources import read_table

    d = read_table(spark, SF_CORRECT, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 7)
    archive = d.filter(F.col("doc_id") % 10 != 7)
    store = substring_window_store(archive, "text", "doc_id")
    inc = sorted(
        map(
            tuple,
            substring_dedup_incremental(
                batch, store, "text", "doc_id"
            ).collect(),
        )
    )
    full = sorted(
        map(
            tuple,
            substring_dedup(d, "text", "doc_id")
            .filter(F.col("doc_id") % 10 == 7)
            .collect(),
        )
    )
    assert inc == full and len(inc) > 0


def test_substring_incremental_store_fold_and_cross_batch_hot(spark):
    """A window under the cap in the archive goes hot when the batch's
    occurrences push the SUM over it — the cross-batch case a
    batch-local rerun would miss — and merge_window_store folds batch
    counts so the next batch sees updated frequencies."""
    from experts_etl_spark.llm.curation import (
        merge_window_store,
        substring_dedup_incremental,
        substring_window_store,
    )

    phrase = "alpha beta gamma delta epsilon"  # one 5-word window
    archive = spark.createDataFrame(
        [(0, phrase + " unique zero"), (1, phrase + " unique one")],
        "doc_id long, text string",
    )
    store = substring_window_store(archive, "text", "doc_id")
    # archive count = 2 = max_sf: not hot yet; batch occurrence -> 3
    batch = spark.createDataFrame(
        [(107, phrase + " fresh content"), (117, "totally new words here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in substring_dedup_incremental(
            batch, store, "text", "doc_id"
        ).collect()
    }
    assert got[107]["n_removed"] == 5
    assert got[107]["clean_text"] == "fresh content"
    assert got[117]["n_removed"] == 0
    # fold the batch in: the phrase window's count is now 3
    batch_counts = (
        substring_window_store(batch, "text", "doc_id")
    )
    merged = merge_window_store(store, batch_counts)
    row = {r["win"]: r["sf"] for r in merged.collect()}
    assert 3 in row.values()  # the now-hot phrase window
    # a SECOND batch with one more occurrence sees sum 3+1 > 2 -> cut
    batch2 = spark.createDataFrame(
        [(127, "preamble " + phrase)], "doc_id long, text string"
    )
    got2 = substring_dedup_incremental(
        batch2, merged, "text", "doc_id"
    ).collect()[0]
    assert got2["n_removed"] == 5 and got2["clean_text"] == "preamble"
