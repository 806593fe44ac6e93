"""Property-based tests (hypothesis) for the invariant-heavy operators —
the reference only has golden fixtures (SURVEY.md §5.1: 'no
property-based tests'); these guard the set-based re-derivations on
adversarial inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from experts_etl_spark.operators import (
    elect_primary,
    merge_upsert,
    run_groups,
    sessionize,
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

entries = st.lists(
    st.tuples(
        st.integers(0, 3),          # entity
        st.integers(0, 50),         # seq (may collide; unique id added below)
        st.sampled_from(["a", "b", "c"]),  # state
    ),
    min_size=1,
    max_size=40,
)


@given(entries)
@SET
def test_run_groups_invariants(spark, rows):
    df = spark.createDataFrame(
        [(e, s, st_, i) for i, (e, s, st_) in enumerate(rows)],
        ["entity", "seq", "state", "uid"],
    )
    out = run_groups(df, ["entity"], ["seq", "uid"], ["state"]).collect()
    by_entity: dict = {}
    for r in sorted(out, key=lambda r: (r.entity, r.seq, r.uid)):
        by_entity.setdefault(r.entity, []).append(r)
    for ent, rs in by_entity.items():
        # group ids start at 1, are non-decreasing, step by ≤1 (dense)
        gids = [r.group_id for r in rs]
        assert gids[0] == 1
        assert all(0 <= b - a <= 1 for a, b in zip(gids, gids[1:]))
        # id increments exactly when the state changes
        for prev, cur in zip(rs, rs[1:]):
            assert (cur.group_id == prev.group_id) == (cur.state == prev.state)


@given(entries)
@SET
def test_elect_primary_exactly_one(spark, rows):
    df = spark.createDataFrame(
        [(e, s, st_, i) for i, (e, s, st_) in enumerate(rows)],
        ["entity", "seq", "state", "uid"],
    )
    pri = F.when(F.col("state") == "a", 0).when(F.col("state") == "b", 1).otherwise(2)
    out = elect_primary(df, ["entity"], pri, [F.col("seq"), F.col("uid")])
    counts = {
        r.entity: r.n
        for r in out.filter("primary").groupBy("entity").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    entities = {e for e, _, _ in rows}
    assert counts == {e: 1 for e in entities}
    # the winner is from the best available priority class
    best = {}
    for e, s, st_ in rows:
        p = {"a": 0, "b": 1, "c": 2}[st_]
        best[e] = min(best.get(e, 9), p)
    for r in out.filter("primary").collect():
        assert {"a": 0, "b": 1, "c": 2}[r.state] == best[r.entity]


versions = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 20)), min_size=1, max_size=30
)


@given(versions, versions)
@SET
def test_merge_upsert_freshness_and_idempotence(spark, tgt_rows, src_rows):
    # target must be keyed: keep max version per key
    tgt_latest: dict = {}
    for k, v in tgt_rows:
        tgt_latest[k] = max(tgt_latest.get(k, -1), v)
    target = spark.createDataFrame(list(tgt_latest.items()), ["k", "v"])
    source = spark.createDataFrame(src_rows, ["k", "v"])
    merged = merge_upsert(target, source, ["k"], freshness_col="v")
    got = {r.k: r.v for r in merged.collect()}
    want = dict(tgt_latest)
    for k, v in src_rows:
        if v > want.get(k, -1):
            want[k] = v
    assert got == want
    # applying the same source again changes nothing (idempotence)
    again = merge_upsert(merged, source, ["k"], freshness_col="v")
    assert {r.k: r.v for r in again.collect()} == want


@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 10_000)), min_size=1, max_size=30))
@SET
def test_sessionize_gap_property(spark, rows):
    GAP = 100
    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rows)], ["k", "t_s", "uid"]
    ).select("k", F.timestamp_seconds("t_s").alias("ts"), "uid")
    out = sessionize(df, ["k"], "ts", GAP).collect()
    by_key: dict = {}
    for r in sorted(out, key=lambda r: (r.k, r.ts)):
        by_key.setdefault(r.k, []).append(r)
    for rs in by_key.values():
        assert rs[0].session_id == 1
        for prev, cur in zip(rs, rs[1:]):
            gap = (cur.ts - prev.ts).total_seconds()
            if gap > GAP:
                assert cur.session_id == prev.session_id + 1
            else:
                assert cur.session_id == prev.session_id


# Winnowing guarantee (Schleimer/Wilkerson/Aiken §2): documents sharing
# a run of at least k+w-1 consecutive words share at least one selected
# fingerprint — the property LSH-style sampling can't give you.
_words = st.sampled_from("aa bb cc dd ee ff gg hh".split())
_docs = st.lists(_words, min_size=6, max_size=18)


@given(_docs, _docs, st.integers(0, 10))
@SET
def test_winnow_shared_run_guarantee(spark, w1, w2, seed):
    from experts_etl_spark.llm.dedup import winnow_fingerprint_sets

    K, W = 4, 3
    run_len = K + W - 1
    # plant a guaranteed common run drawn from doc 1 into doc 2
    if len(w1) >= run_len:
        start = seed % (len(w1) - run_len + 1)
        run = w1[start : start + run_len]
        pos = seed % (len(w2) + 1)
        w2 = w2[:pos] + run + w2[pos:]
        planted = True
    else:
        planted = False
    df = spark.createDataFrame(
        [(1, " ".join(w1)), (2, " ".join(w2))], ["doc_id", "text"]
    )
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprint_sets(df, "text", "doc_id", K, W).collect():
        fps[r.doc_id].add(r.fp)
    if planted:
        assert fps[1] & fps[2], (w1, w2)


@given(entries)
@SET
def test_split_stints_partition_invariants(spark, rows):
    """Stints are dense per key, every active-after-inactive boundary
    starts a new stint, and no row survives past the first closed row."""
    from experts_etl_spark.operators import split_stints

    df = spark.createDataFrame(
        [(k, i, s) for i, (k, _, s) in enumerate(rows)], ["k", "uid", "state"]
    )
    out = split_stints(
        df,
        keys=["k"],
        order_by=["uid"],
        status_col="state",
        active_statuses=["a"],
        closed_status="c",
    ).collect()
    by_key: dict = {}
    for r in sorted(out, key=lambda r: (r.k, r.uid)):
        by_key.setdefault(r.k, []).append(r)
    for k, rs in by_key.items():
        # no row after the first closed row
        closed = [i for i, r in enumerate(rs) if r.state == "c"]
        assert not closed or closed[0] == len(rs) - 1
        # stint ids are non-decreasing and step by at most 1
        for prev, cur in zip(rs, rs[1:]):
            assert cur.stint_id in (prev.stint_id, prev.stint_id + 1)
            # a new stint starts exactly when active follows inactive
            if (cur.state == "a") != (prev.state == "a"):
                if cur.state == "a":
                    assert cur.stint_id == prev.stint_id + 1
                else:
                    assert cur.stint_id == prev.stint_id


@given(
    st.lists(st.integers(0, 30), max_size=25, unique=True),
    st.lists(st.integers(0, 30), max_size=25, unique=True),
)
@SET
def test_reconcile_sets_round_trip(spark, cur_ids, des_ids):
    """Applying (to_add, to_delete) to the current set yields exactly the
    desired set — the X3 reconciliation contract
    (transformer_loaders/pure_api_internal_person.py:163-173)."""
    from experts_etl_spark.operators import reconcile_sets

    cur = spark.createDataFrame([(i,) for i in cur_ids] or [(None,)], "id int").filter(
        F.col("id").isNotNull()
    )
    des = spark.createDataFrame([(i,) for i in des_ids] or [(None,)], "id int").filter(
        F.col("id").isNotNull()
    )
    to_add, to_delete = reconcile_sets(cur, des, ["id"])
    add = {r.id for r in to_add.collect()}
    delete = {r.id for r in to_delete.collect()}
    assert add == set(des_ids) - set(cur_ids)
    assert delete == set(cur_ids) - set(des_ids)
    assert (set(cur_ids) | add) - delete == set(des_ids)


word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
docs_strategy = st.lists(
    st.lists(word, min_size=3, max_size=10), min_size=2, max_size=8
)


@given(docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_minhash_lsh_subset_of_exact_jaccard(spark, docs):
    """Every pair LSH reports passed the exact verify, so the LSH output
    must be a SUBSET of the exact shingle-join Jaccard pairs at the same
    threshold, with identical scores — LSH may only lose pairs (banding
    misses), never invent or misscore them."""
    from experts_etl_spark.llm.dedup import minhash_lsh_dedup, ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    lsh = {
        (r.id1, r.id2): r.jaccard
        for r in minhash_lsh_dedup(df, "text", "doc_id", 0.5).collect()
    }
    exact = {
        (r.id1, r.id2): r.jaccard
        for r in ngram_jaccard_pairs(df, "text", "doc_id", 0.5).collect()
    }
    for pair, j in lsh.items():
        assert pair in exact, f"LSH invented pair {pair}"
        assert abs(exact[pair] - j) < 1e-12


@given(docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_prefix_filter_equals_naive_exact_jaccard(spark, docs):
    """The AllPairs/PPJoin prefix filter is LOSSLESS: the prefix-blocked
    miner must produce exactly the same pair set and scores as the naive
    full-shingle-blocked exact join, at any threshold — the lemma says
    two sets with Jaccard ≥ t always share a shingle inside both
    rarity-ordered prefixes of length n − ⌈t·n⌉ + 1."""
    from experts_etl_spark.llm.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    # 0.55 exercises the binary-rounding ceil guard: t·n for n=20 is
    # 11.000000000000002 in doubles, which unguarded ceil rounds to 12,
    # shortening the prefix and losing pairs at exactly t.
    for threshold in (0.3, 0.5, 0.55, 0.8):
        exact = {
            (r.id1, r.id2): r.jaccard
            for r in ngram_jaccard_pairs(df, "text", "doc_id", threshold).collect()
        }
        pref = {
            (r.id1, r.id2): r.jaccard
            for r in ngram_jaccard_pairs_prefix(
                df, "text", "doc_id", threshold
            ).collect()
        }
        assert pref.keys() == exact.keys(), (
            f"t={threshold}: prefix lost {exact.keys() - pref.keys()}, "
            f"invented {pref.keys() - exact.keys()}"
        )
        for pair, j in exact.items():
            assert abs(pref[pair] - j) < 1e-12


# --- round-4 curation operators -------------------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=25,
)


@given(edge_lists)
@SET
def test_connected_components_match_union_find(spark, edges):
    """Hash-min label propagation must agree with a driver-side
    union-find on arbitrary graphs (chains, cycles, stars, islands)."""
    from experts_etl_spark.llm.curation import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {}
    for n in parent:
        root = find(n)
        want.setdefault(root, set()).add(n)
    expected = {n: min(members) for members in want.values() for n in members}

    df = spark.createDataFrame(edges, "id1 int, id2 int")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == expected


pii_texts = st.text(
    alphabet=st.sampled_from(list("abz01239.-@ ")), min_size=0, max_size=40
)


@given(pii_texts)
@SET
def test_redact_pii_idempotent_and_clean(spark, text):
    """Redaction is idempotent (tokens contain no redactable spans) and
    a second pass finds zero matches — no pattern matches its own
    replacement or a neighbour's residue."""
    from experts_etl_spark.llm.curation import redact_pii

    df = spark.createDataFrame([(text,)], "text string")
    once, _ = redact_pii(F.col("text"))
    row = df.select(once.alias("t1")).collect()[0]
    df2 = spark.createDataFrame([(row["t1"],)], "text string")
    twice, counts2 = redact_pii(F.col("text"))
    r2 = df2.select(
        twice.alias("t2"), *[c.alias(k) for k, c in counts2.items()]
    ).collect()[0]
    assert r2["t2"] == row["t1"]
    assert all(r2[k] == 0 for k in ("email", "ssn", "phone", "ip"))
