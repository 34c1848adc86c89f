"""Multimodal column plumbing: image/audio/video payloads as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (``decode_image`` raises
NotImplementedError — no imaging libraries in this environment; swap in
PIL/torchaudio/pyav on a real cluster) and replaced by a clearly-marked
deterministic fake (``fake_decode_meta``) so the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and tested.

Scale notes: payloads travel as Arrow binary batches; metadata extraction
is a projection (no shuffle); `mapInPandas` keeps per-batch memory bounded
by spark.sql.execution.arrow.maxRecordsPerBatch, which is the knob that
matters when payloads are MBs each (set it low for video).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, n_bytes long"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a typed media table from the documents fixture: payload =
    utf-8 bytes of text (a stand-in for image/audio bytes; the plumbing —
    binary column + typed metadata — is what's exercised)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"))
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, sha256) — JVM-side metadata projection
    (no Python, no shuffle; sha256 doubles as the content invariant)."""
    return media.select(
        "media_id", "kind", "n_bytes", F.sha2(F.col("payload"), 256).alias("sha256")
    )


def decode_image(payload: bytes):
    """REAL decode goes here (PIL.Image.open etc.). Not available in this
    container — the deterministic fake below carries the pipeline."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use fake_decode_meta for the pipeline plumbing"
    )


def fake_decode_meta(media: DataFrame) -> DataFrame:
    """(media_id, width, height, n_frames, duration_s) — DETERMINISTIC FAKE
    decode: dimensions derived from the payload sha256, so the full
    mapInPandas pipeline (binary in → struct out) is exercised end-to-end
    and reproducible. Replace the body with real decoding on a real
    cluster."""

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digs = [hashlib.sha256(p).digest() for p in pdf["payload"]]
            width = [1 + int.from_bytes(d[0:2], "big") % 1920 for d in digs]
            height = [1 + int.from_bytes(d[2:4], "big") % 1080 for d in digs]
            frames = [
                1 if k == "image" else 1 + int.from_bytes(d[4:6], "big") % 3600
                for k, d in zip(pdf["kind"], digs)
            ]
            dur = [
                0.0 if k == "image" else round(f / 30.0, 3)
                for k, f in zip(pdf["kind"], frames)
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width,
                "height": height,
                "n_frames": frames,
                "duration_s": dur,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        decode_batches,
        "media_id long, width int, height int, n_frames int, duration_s double",
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """(media_id, frame_idx) — frame sampling plan for video payloads:
    explode of the fake-decoded frame count (the real pipeline would feed
    these (media_id, frame_idx) pairs back into a decode-UDF)."""
    meta = fake_decode_meta(media)
    return (
        meta.filter(F.col("n_frames") > 1)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def fake_resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """(media_id, width, height, out_width, out_height, scale) — resize
    PLAN over the decoded dims: aspect-preserving fit into max_side².
    Pure column arithmetic over fake_decode_meta (JVM-side, no Python);
    the real pipeline would feed (media_id, out dims) into a resample UDF
    exactly like fake_feature_extract below consumes payloads."""
    meta = fake_decode_meta(media)
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return meta.select(
        "media_id", "width", "height",
        F.greatest(F.lit(1), F.round(F.col("width") * scale).cast("int"))
        .alias("out_width"),
        F.greatest(F.lit(1), F.round(F.col("height") * scale).cast("int"))
        .alias("out_height"),
        F.round(scale, 6).alias("scale"),
    )


def fake_feature_extract(media: DataFrame, dim: int = 16) -> DataFrame:
    """(media_id, embedding: array<double>) — DETERMINISTIC FAKE feature
    extractor: unit-norm vector derived from the payload sha256 (stands in
    for a CLIP/wav2vec forward pass; swap the body on a real cluster).
    Arrow-batched mapInPandas, numpy-vectorized per batch — the exact
    plumbing a real model UDF uses, and its output feeds the ANN layer
    (similarity.ann_ivf / ann_lsh) directly."""
    import numpy as np

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for p in pdf["payload"]:
                d = hashlib.sha256(p).digest() * ((8 * dim) // 32 + 1)
                v = np.frombuffer(d[: 8 * dim], dtype=np.uint64).astype(np.float64)
                v = (v / 2**64) - 0.5
                n = np.linalg.norm(v)
                vecs.append((v / (n or 1.0)).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return media.select("media_id", "payload").mapInPandas(
        extract, "media_id long, embedding array<double>"
    )
