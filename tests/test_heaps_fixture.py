"""The Heaps'-law scale fixture (tools/gen_scaledata.py --corpus heaps,
r10 verdict next #1): the 81× saturation story needs a corpus whose
duplication signal is scale-INVARIANT — vocabulary grows as n^0.7 so
chance shingle collisions stay bounded while the injected 1%/4%
exact/near-dup rates hold.  These tests pin the fixture's invariants
and its ORACLE AGREEMENT: the gated dedup queries hash-match their
DuckDB oracles on a heaps-generated directory, so the @heaps
SCALE_FIT rows measure the same proven semantics as the canonical
rows, just on the saturation-free corpus.
"""

from __future__ import annotations

import duckdb
import pytest

from experts_etl_spark.plans.registry import ORACLES, QUERIES
from tests.oracle_utils import compare_spark_duckdb
from tools.gen_scaledata import gen_documents, heaps_vocab_size


def test_heaps_vocab_growth_and_anchoring():
    # anchored: the 1x fixture keeps the fixed mode's vocabulary
    assert heaps_vocab_size(5000) == 2000
    # Heaps growth ~ n^0.7: 81x docs -> ~21.7x vocab
    assert heaps_vocab_size(405000) == pytest.approx(2000 * 81**0.7, rel=0.01)
    # monotone, floored
    assert heaps_vocab_size(100) == 2000


def test_heaps_duplication_rates_scale_invariant():
    """The injected duplicate rates are corpus-size-independent — the
    property that makes the @heaps exponents interpretable."""
    con = duckdb.connect()
    for n in (2000, 6000):
        tbl = gen_documents(n, seed=42, corpus="heaps")
        con.register("t", tbl)
        total, distinct = con.execute(
            "SELECT count(*), count(DISTINCT text) FROM t"
        ).fetchone()
        exact_rate = 1 - distinct / total
        assert 0.005 <= exact_rate <= 0.015, (n, exact_rate)
        con.unregister("t")


@pytest.fixture(scope="module")
def heaps_dir(tmp_path_factory):
    from tools.gen_scaledata import generate

    d = tmp_path_factory.mktemp("heaps") / "corpus"
    generate(str(d), docs=1500, vecs=600, seed=42, mode="uniform",
             corpus="heaps")
    return str(d)


@pytest.mark.parametrize(
    "name", ["dedup_lsh_recall", "dedup_exact_substrings"]
)
def test_headline_dedup_queries_agree_with_oracle_on_heaps(
    spark, heaps_dir, name
):
    """Oracle agreement on the heaps fixture for exactly the two
    queries whose @heaps SCALE_FIT rows carry the saturation story."""
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{heaps_dir}/{t}.parquet'"
        )
    compare_spark_duckdb(QUERIES[name](spark, heaps_dir), con, ORACLES[name])
