"""Cross-engine unicode determinism: the text pack's normalization
contract is whitespace-split + lower(); this pins that Spark (JVM) and
DuckDB (utf8proc) agree on it for the unicode classes a real corpus
carries — accents, CJK, cyrillic, emoji, NBSP-adjacent spacing,
combining marks — and DOCUMENTS the one known divergence (locale-style
special casings like Turkish İ, where Java lowercases to ``i`` +
combining-dot U+0307 and DuckDB to plain ``i``).

Production rule this encodes: apply NFC + casefold normalization at
INGEST (before the engine) if the corpus carries special-casing
characters; inside the engine the md5 fingerprint is byte-faithful to
whatever arrived.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare_spark_duckdb

AGREEING_TEXTS = [
    "Crème brûlée est très bon naïve café",
    "日本語 の テスト 文書 です 日本語 テスト",
    "Привет мир это тест Привет мир",
    "emoji 🙂 test 🙂 again ok fine",
    "combining é and plain é differ maybe",  # NFC vs NFD stay distinct in BOTH
    "MIXED Case WORDS lower The Same Way",
]
DIVERGENT_TEXT = "Turkish İstanbul dotless ı"  # Java İ→i+U+0307, DuckDB İ→i

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

PINNED = [
    "text_quality_metrics",
    "dedup_exact",
    "repetition_metrics",
    "pii_redaction",
    "tfidf_topk_terms",
    "corpus_token_stats",
    "epoch_shuffle",
    "multimodal_dedup",
    "train_val_split",
]


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unicode_docs"))
    texts = AGREEING_TEXTS
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["xx"] * len(texts),
                "source": ["src0"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


@pytest.fixture(scope="module")
def unicode_duck(unicode_sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{unicode_sf}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("name", PINNED)
def test_text_queries_agree_on_unicode(spark, unicode_sf, unicode_duck, name):
    compare_spark_duckdb(
        QUERIES[name](spark, unicode_sf), unicode_duck, ORACLES[name]
    )


def test_special_casing_divergence_is_still_present(spark):
    """Canary: Java and utf8proc disagree on İ's lowercase.  If either
    engine changes this, fingerprints of special-casing corpora silently
    shift — surface it here instead."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(DIVERGENT_TEXT,)], "text string")
    spark_lower = df.select(F.lower("text").alias("l")).collect()[0]["l"]
    import duckdb

    duck_lower = duckdb.connect().execute(
        "SELECT lower(?)", [DIVERGENT_TEXT]
    ).fetchone()[0]
    assert "i̇" in spark_lower  # Java: İ → i + combining dot above
    assert "i̇" not in duck_lower  # utf8proc: İ → i
    assert spark_lower != duck_lower
