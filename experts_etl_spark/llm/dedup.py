"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB): every pairwise comparison is blocked by a content
key — shingle for exact-Jaccard, LSH band for MinHash, bit-chunk for
SimHash — so the self-join shuffles on the block key and never goes
quadratic in the corpus.  Hash functions are md5-derived 60-bit ints
(`conv(substr(md5(..),1,15),16,10)`) so any engine reproduces them.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from experts_etl_spark.llm.text import fingerprint, words

N_MINHASH = 16
BAND_ROWS = 4  # 16 hashes → 4 bands of 4 rows


def hex60(col: Column) -> Column:
    """First 15 hex digits of md5 as a positive 60-bit bigint —
    engine-portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased text; empty array when the
    document has fewer than n words."""
    w = words(text)
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(sh)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by normalized-content hash: one row per distinct
    fingerprint with the lowest id as keeper and the copy count."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    return fp.groupBy("fp").agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )


def doc_shingles(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exploded (id, shingle) pairs — the blocked join key for Jaccard
    and the input to MinHash."""
    return df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col))).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle-blocked self-join.

    |A∩B| comes from the join; |A∪B| = |A|+|B|−|A∩B|.  All integer
    arithmetic until the final division (deterministic double).
    """
    sh = doc_shingles(df, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2"))
    jac = (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id1", "id2", "jaccard")


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = N_MINHASH
) -> DataFrame:
    """MinHash signature: per doc, min over shingles of h_i(shingle),
    h_i = hex60(md5('i:' || shingle)).  One exploded aggregation, no UDF."""
    sh = doc_shingles(df, text_col, id_col)
    aggs = [
        F.min(hex60(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    signatures: DataFrame, id_col: str, band_rows: int = BAND_ROWS
) -> DataFrame:
    """LSH banding: concat each band of the signature into a key; docs
    sharing any (band_idx, band_key) are candidates.  The self-join is
    blocked on the band key — the only shuffle that scales with corpus
    size."""
    h_cols = [c for c in signatures.columns if c.startswith("h")]
    n_bands = len(h_cols) // band_rows
    bands = []
    for bi in range(n_bands):
        chunk = h_cols[bi * band_rows : (bi + 1) * band_rows]
        bands.append(
            signatures.select(
                F.col(id_col),
                F.lit(bi).alias("band_idx"),
                F.md5(F.concat_ws(",", *[F.col(c).cast("string") for c in chunk])).alias(
                    "band_key"
                ),
            )
        )
    stacked = bands[0]
    for bdf in bands[1:]:
        stacked = stacked.unionByName(bdf)
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, on=["band_idx", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame, text_col: str, id_col: str, threshold: float
) -> DataFrame:
    """MinHash→LSH→verify: candidates from banding, then exact Jaccard
    verification of candidates only (the classic two-phase near-dedup)."""
    cands = lsh_candidates(minhash_signatures(df, text_col, id_col), id_col)
    verified = ngram_jaccard_pairs(df, text_col, id_col, threshold)
    return cands.join(verified, on=["id1", "id2"], how="inner").select(
        "id1", "id2", "jaccard"
    )


# --- SimHash (Pandas-UDF path: genuinely non-SQL, Arrow-batched) ---------

def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens: per token take the md5-low
    64 bits; each bit position accumulates +1/−1; sign → bit."""

    def one(text: str) -> int:
        if not text:
            return 0
        acc = [0] * 64
        for tok in text.lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(64):
            if acc[b] > 0:
                v |= 1 << b
        # fold into signed 64-bit
        return v - (1 << 64) if v >= (1 << 63) else v

    return texts.map(one)


def simhash64() -> "F.UserDefinedFunctionLike":
    """Arrow-batched pandas UDF (built lazily — pandas_udf needs an
    active SparkSession to resolve its return type)."""
    from pyspark.sql.types import LongType

    return F.pandas_udf(_simhash_batch, LongType())


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit chunks (two docs within
    hamming distance 3 of 64 bits share at least one of 4 chunks —
    pigeonhole), verify hamming via bit_count(xor)."""
    sig = df.select(F.col(id_col), simhash64()(F.col(text_col)).alias("sig"))
    chunks = None
    for ci in range(4):
        part = sig.select(
            F.col(id_col),
            F.col("sig"),
            F.lit(ci).alias("chunk_idx"),
            F.shiftrightunsigned(F.col("sig"), ci * 16).bitwiseAND(F.lit(0xFFFF)).alias(
                "chunk_key"
            ),
        )
        chunks = part if chunks is None else chunks.unionByName(part)
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(b, on=["chunk_idx", "chunk_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
