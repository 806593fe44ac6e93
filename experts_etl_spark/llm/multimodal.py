"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages.  The media codecs are NOT in this container, so
the actual decode is stubbed: `decode_image` raises NotImplementedError
unless a PIL-style decoder is importable, and `fake_decode_features`
provides the deterministic stand-in used by tests.  Everything
Spark-side — schema, partitioning, UDF signature, batch shape — is real.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id bigint, n_bytes bigint, content_md5 string, sniffed string"
FRAME_SCHEMA = "doc_id bigint, n_frames int, frame_bytes bigint"


def with_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stand-in asset builder: utf-8 bytes of the text as the opaque
    payload plus a typed metadata struct (what an ingest job would carry
    for real image/audio bytes)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).alias("declared_len"),
        ).alias("meta"),
    )


def _sniff(b: bytes) -> str:
    if b[:4] == b"\x89PNG":
        return "image/png"
    if b[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if b[:4] == b"RIFF":
        return "audio/wav"
    return "application/octet-stream"


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column —
    the real mapInPandas plumbing (batch in, batch out)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "sniffed": payloads.map(lambda b: _sniff(bytes(b))),
                }
            )

    return assets.mapInPandas(batches, schema=META_SCHEMA)


def frame_sample(assets: DataFrame, frame_size: int = 64, every: int = 4) -> DataFrame:
    """Deterministic fake frame-sampler: chunk the payload into
    ``frame_size``-byte frames and keep every ``every``-th — the batch
    shape and schema a real video frame-sampler would have."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def stats(b: bytes) -> tuple[int, int]:
                frames = [
                    b[i : i + frame_size] for i in range(0, len(b), frame_size)
                ][::every]
                return len(frames), sum(len(f) for f in frames)

            res = pdf["payload"].map(lambda b: stats(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": res.map(lambda t: t[0]).astype("int32"),
                    "frame_bytes": res.map(lambda t: t[1]).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - container lacks codecs
    """Real decode path, gated on an importable decoder.  The container
    ships no image libs, so this raises — callers use
    ``fake_decode_features`` in tests (clearly-marked stub per the
    build contract)."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; use fake_decode_features for plumbing tests"
        ) from exc


def fake_decode_features(assets: DataFrame, dims: int = 4) -> DataFrame:
    """Deterministic fake 'decoder': md5-derived pseudo-features with
    the exact schema/batch shape a real embedding extractor would emit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def feats(b: bytes) -> list[float]:
                h = hashlib.md5(bytes(b)).digest()
                return [h[i] / 255.0 for i in range(dims)]

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": pdf["payload"].map(feats)}
            )

    return assets.mapInPandas(batches, schema="doc_id bigint, features array<double>")
