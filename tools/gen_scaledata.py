#!/usr/bin/env python
"""Deterministic generator for LLM-pack scale/recall fixtures.

Produces ``documents.parquet`` + ``embeddings.parquet`` with the same
schemas as the driver's testdata (TESTDATA.md) so every registered
LLM-pack query runs unchanged against the generated directory:

- **Scale points** (``--mode uniform``): the 100 TB evidence needs at
  least two sizes from ONE generator so a linear fit is meaningful —
  the driver ships a single documents/embeddings size per sf, so cross-
  sf fits would mix generators.  ``tools/scale_fit.py`` times the pack
  at 1× and 3× from this generator and fits the ratio.
- **Clustered embeddings** (``--mode clustered``): deterministic
  mixture-of-Gaussians on a K-center grid.  The driver's near-uniform
  vectors are the worst case for coarse quantization (VERDICT r2/r3) —
  cluster structure is what real embedding corpora have, and where IVF
  separation shows.

Everything is seeded; no wall-clock, no machine dependence.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "en", "en", "en", "de", "fr", "es", "pt"]  # en-heavy like testdata
DIM = 64


def gen_embeddings(
    n: int, seed: int, mode: str, k_clusters: int = 16, noise: float = 0.03
) -> pa.Table:
    rng = np.random.default_rng(seed)
    if mode == "uniform":
        vecs = rng.uniform(-0.5, 0.5, size=(n, DIM)).astype(np.float32)
        labels = rng.integers(0, 10, size=n).astype(np.int32)
    else:
        if mode == "clustered_scaled":
            # scale-series variant (r11 verdict next #7): cluster count
            # grows ~sqrt(n) — a growing corpus grows topics, matching
            # the nlist ~ sqrt(n) IVF design point, so per-cluster
            # occupancy stays ~sqrt(n) instead of n/16 — the realistic
            # fixture for ANN-audit exponents (the fixed-16 'clustered'
            # mode is kept byte-identical for the recall fixtures).
            k_clusters = max(16, int(np.sqrt(n)))
        centers = rng.uniform(-0.5, 0.5, size=(k_clusters, DIM))
        labels = rng.integers(0, k_clusters, size=n).astype(np.int32)
        vecs = (centers[labels] + rng.normal(0.0, noise, size=(n, DIM))).astype(
            np.float32
        )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def heaps_vocab_size(n_docs: int, base: int = 2000, base_docs: int = 5000) -> int:
    """Heaps'-law vocabulary for an ``n_docs`` corpus:
    |V| = base · (n/base_docs)^0.7, floored at ``base``.  The FIXED
    2000-word vocab is what saturated the 81× legs (r10 verdict Wrong
    #1: 3× docs → 9.17× chance band collisions because every possible
    shingle is eventually drawn); real corpora keep minting new types
    (Heaps' law, β≈0.4–0.9), so the shingle space grows with the corpus
    and the per-doc chance-collision rate stays ~constant.  Anchored so
    the 1× fixture (5000 docs) keeps the SAME vocabulary as the fixed
    mode — the two modes diverge only as the corpus grows."""
    return max(base, int(round(base * (n_docs / base_docs) ** 0.7)))


def gen_documents(
    n: int, seed: int, vocab_size: int = 2000, corpus: str = "fixed"
) -> pa.Table:
    """Zipf-ish word draws; ~4% of docs are near-dup copies (a few words
    swapped) and ~1% exact copies, so every dedup family has signal.

    ``corpus="fixed"`` is the original fixture (byte-identical to every
    committed SCALE_FIT row); ``corpus="heaps"`` grows the vocabulary
    with the corpus (Heaps' law) so duplication signal is
    scale-INVARIANT: truth pairs still arrive at the fixed 1%/4% rates,
    but chance shingle collisions no longer explode as n grows."""
    rng = np.random.default_rng(seed)
    if corpus == "heaps":
        vocab_size = heaps_vocab_size(n)
    vocab = np.array([f"w{i:05d}" if corpus == "heaps" else f"w{i:04d}"
                      for i in range(vocab_size)])
    # zipf-ish rank weights
    w = 1.0 / np.arange(1, vocab_size + 1)
    w /= w.sum()
    cumw = np.cumsum(w)

    def draw(ln: int) -> np.ndarray:
        if corpus == "heaps":
            # inverse-CDF draw: O(ln·log|V|) regardless of vocab size
            # (rng.choice's per-call setup is O(|V|), which dominates at
            # Heaps-grown vocabularies)
            idx = np.searchsorted(cumw, rng.random(ln), side="right")
            return vocab[np.minimum(idx, vocab_size - 1)]
        return rng.choice(vocab, size=ln, p=w)

    texts: list[str] = []
    for i in range(n):
        if i > 0 and i % 100 == 99:  # exact dup of a recent doc
            texts.append(texts[i - rng.integers(1, 50)])
            continue
        ln = int(rng.integers(20, 200))
        words = draw(ln)
        if i > 0 and i % 25 == 24:  # near-dup: copy + perturb a few words
            base = texts[i - rng.integers(1, 20)].split()
            if len(base) > 10:
                idx = rng.integers(0, len(base), size=3)
                for j in idx:
                    base[j] = vocab[rng.integers(0, vocab_size)]
                texts.append(" ".join(base))
                continue
        texts.append(" ".join(words))
    langs = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), size=n)]
    sources = [f"src{int(x)}" for x in rng.integers(1, 21, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def generate(
    outdir: str, docs: int, vecs: int, seed: int, mode: str, corpus: str = "fixed"
) -> None:
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(
        gen_documents(docs, seed, corpus=corpus),
        os.path.join(outdir, "documents.parquet"),
    )
    pq.write_table(
        gen_embeddings(vecs, seed + 1, mode), os.path.join(outdir, "embeddings.parquet")
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--vecs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mode", choices=["uniform", "clustered", "clustered_scaled"], default="uniform")
    ap.add_argument("--corpus", choices=["fixed", "heaps"], default="fixed")
    args = ap.parse_args()
    generate(args.outdir, args.docs, args.vecs, args.seed, args.mode, args.corpus)
    print(
        f"wrote {args.outdir}: {args.docs} docs, {args.vecs} vecs "
        f"({args.mode}, corpus={args.corpus})"
    )
