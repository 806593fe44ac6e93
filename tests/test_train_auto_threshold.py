"""TRAIN_AUTO_MIN self-selection regression (r7 verdict, What's wrong #1).

``_kmeans_train``'s default (``train_mod=None``) self-selects
√n-proportional SAMPLED Lloyd training once the corpus exceeds
``TRAIN_AUTO_MIN`` (65,536 vectors).  The pinned full-training queries
(``ann_ivf_kmeans``, ``ann_topk_ivf_refined``, ``ann_recall``) pass
``train_mod="full"`` because their DuckDB oracles hardcode full-corpus
iterations; before round 8 they relied on the default and would have
silently diverged past the threshold.  This test builds a corpus ON
BOTH SIDES of the threshold (none of the shipped testdata scales
crosses it — sf0.1 has 2,000 embeddings) and proves, against
dim-generic DuckDB oracles over the same parquet:

* above the threshold, ``train_mod="full"`` == the FULL oracle (the
  pin holds where it matters);
* above the threshold, the default == the SAMPLING-AWARE oracle (the
  self-selection itself is bit-exact, stride = auto_train_mod(n));
* below the threshold, the default == the FULL oracle (None means
  full where the sample would barely undercut the corpus).

Low-dim (4) vectors keep the n·nlist cross join cheap while the row
count genuinely crosses 2^16.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from experts_etl_spark.llm.similarity import (
    TRAIN_AUTO_MIN,
    auto_train_mod,
    kmeans_refined_assign,
)

DIM = 4
N_BIG = TRAIN_AUTO_MIN + 512  # 66,048 — just across the threshold
N_SMALL = 4_096
CENT_MOD_BIG = 2_048  # 33 seeds → 66k×33 score pairs per pass
CENT_MOD_SMALL = 256


def _gen_embeddings(path: str, n: int) -> None:
    ids = np.arange(n, dtype=np.int64)
    # Deterministic pseudo-random grid values; exactly representable in
    # float32 so both engines quantize the identical doubles.
    vals = np.empty((n, DIM), dtype=np.float32)
    for d in range(DIM):
        vals[:, d] = (
            ((ids * 37 + d * 1009) * 2654435761 % 4096) / 4096.0 - 0.5
        ).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vals.reshape(-1), type=pa.float32()), DIM
    ).cast(pa.list_(pa.float32()))
    pq.write_table(
        pa.table({"vec_id": pa.array(ids), "embedding": emb}), path
    )


def _iter_sql(cprev: str, k: int, src: str) -> str:
    return f"""
    a{k} AS (SELECT vec_id, q, n2, cent_id FROM (
      SELECT e.vec_id, e.q, e.n2, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.q, c.cq) / sqrt(e.n2 * c.cn2) DESC,
                        c.cent_id) AS rn
      FROM {src} e CROSS JOIN {cprev} c) WHERE rn = 1),
    s{k} AS (SELECT cent_id, i, sum(q[i]) AS s, count(*) AS cnt
             FROM a{k} CROSS JOIN range(1, {DIM + 1}) t(i) GROUP BY 1, 2),
    c{k} AS (SELECT cent_id, cq, list_dot_product(cq, cq) AS cn2 FROM (
      SELECT cent_id, list(m ORDER BY i) AS cq FROM (
        SELECT cent_id, i, floor(s / cnt) AS m FROM s{k}) GROUP BY cent_id))"""


def _oracle_sql(parquet: str, cent_mod: int, train_stride: int | None) -> str:
    """One Lloyd iteration + final full-corpus assignment, dim-generic
    twin of the shipped ``ann_ivf_kmeans`` oracle (llm/queries.py)."""
    if train_stride and train_stride > 1:
        tr = (
            f"(SELECT * FROM n WHERE vec_id % {train_stride} = 0"
            f" OR vec_id % {cent_mod} = 0)"
        )
    else:
        tr = "n"
    return f"""
    WITH qe AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT) AS DOUBLE)) AS q
      FROM '{parquet}'
    ),
    n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM qe),
    c0 AS (SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM n
           WHERE vec_id % {cent_mod} = 0),
    {_iter_sql('c0', 1, tr)},
    fin AS (SELECT vec_id, cent_id, cos FROM (
      SELECT e.vec_id, c.cent_id,
             list_dot_product(e.q, c.cq) / sqrt(e.n2 * c.cn2) AS cos,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.q, c.cq) / sqrt(e.n2 * c.cn2) DESC,
                        c.cent_id) AS rn
      FROM n e CROSS JOIN c1 c) WHERE rn = 1)
    SELECT vec_id, cent_id, cos,
           CAST(count(*) OVER (PARTITION BY cent_id) AS BIGINT) AS n_members
    FROM fin
    """


@pytest.fixture(scope="module")
def big_parquet(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann_big") / "embeddings.parquet")
    _gen_embeddings(p, N_BIG)
    return p


@pytest.fixture(scope="module")
def small_parquet(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann_small") / "embeddings.parquet")
    _gen_embeddings(p, N_SMALL)
    return p


def _run_spark(spark, parquet: str, cent_mod: int, train_mod):
    e = spark.read.parquet(parquet)
    return kmeans_refined_assign(
        e, "vec_id", "embedding", cent_mod=cent_mod, iters=1,
        train_mod=train_mod,
    )


def _compare(spark_df, sql: str) -> None:
    import duckdb

    from tests.oracle_utils import compare_spark_duckdb

    con = duckdb.connect()
    try:
        compare_spark_duckdb(spark_df, con, sql)
    finally:
        con.close()


def test_full_pin_above_threshold(spark, big_parquet):
    """train_mod="full" keeps full-corpus training past TRAIN_AUTO_MIN —
    the contract the pinned baseline queries (and their oracles) rely
    on."""
    df = _run_spark(spark, big_parquet, CENT_MOD_BIG, "full")
    _compare(df, _oracle_sql(big_parquet, CENT_MOD_BIG, None))


def test_default_selects_sampled_above_threshold(spark, big_parquet):
    """The out-of-the-box default self-selects √n-sampled training past
    the threshold, bit-exact against a sampling-aware oracle."""
    stride = auto_train_mod(N_BIG)
    assert stride > 1, "threshold corpus must actually sample"
    df = _run_spark(spark, big_parquet, CENT_MOD_BIG, None)
    _compare(df, _oracle_sql(big_parquet, CENT_MOD_BIG, stride))


def test_default_is_full_below_threshold(spark, small_parquet):
    """Below TRAIN_AUTO_MIN the default trains full — identical to the
    pinned full oracle."""
    df = _run_spark(spark, small_parquet, CENT_MOD_SMALL, None)
    _compare(df, _oracle_sql(small_parquet, CENT_MOD_SMALL, None))
