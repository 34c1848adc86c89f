"""Multimodal column plumbing: image/audio/video payloads as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Decode is REAL for the formats numpy + the stdlib can parse — P6 PPM
images (``decode_image``), 24-bit uncompressed BMP (same), and PCM WAV
audio (``decode_audio``) — and those paths are exercised end-to-end on
genuine file bytes built by :func:`synthesize_media`. Compressed formats
(JPEG/PNG/MP3/H.264) need codec libraries absent from this environment;
``decode_image``/``decode_audio`` raise ``ValueError`` for them, and the
clearly-marked deterministic fakes (``fake_decode_meta``,
``fake_feature_extract``) remain for pipeline tests that don't care about
pixel truth.

Scale notes: payloads travel as Arrow binary batches; metadata extraction
is a projection (no shuffle); `mapInPandas` keeps per-batch memory bounded
by spark.sql.execution.arrow.maxRecordsPerBatch, which is the knob that
matters when payloads are MBs each (set it low for video).
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
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


def decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """REAL image decode for the uncompressed formats numpy can parse.
    Returns (width, height, n_channels, pixels[h, w, c] uint8).

    * P6 PPM: ASCII header ``P6 <w> <h> <maxval>`` (whitespace/comment
      separated) + raw RGB bytes.
    * BMP: BITMAPINFOHEADER, 24-bit, uncompressed (BI_RGB) — BGR rows
      stored bottom-up, 4-byte padded.

    Compressed formats (JPEG/PNG/…) need a codec library — ValueError."""
    if payload[:2] == b"P6":
        # header = magic + 3 ints, '#' comments legal between tokens
        toks: list[bytes] = []
        i = 2
        while len(toks) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
        i += 1  # single whitespace after maxval, then raster
        w, h, maxval = (int(t) for t in toks)
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        px = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
        return w, h, 3, px.reshape(h, w, 3)
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError("only 24-bit uncompressed BMP supported")
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, np.uint8, count=stride * abs(h), offset=off
        ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
        if h > 0:  # positive height = bottom-up storage
            rows = rows[::-1]
        return w, abs(h), 3, rows[:, :, ::-1]  # BGR → RGB
    raise ValueError(
        "unsupported image format (JPEG/PNG need a codec library not "
        "present in this environment)"
    )


def decode_audio(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """REAL audio decode for PCM WAV (stdlib ``wave``). Returns
    (sample_rate, n_channels, n_samples, samples[n, ch] int16)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        sr, ch, n = wf.getframerate(), wf.getnchannels(), wf.getnframes()
        raw = wf.readframes(n)
    return sr, ch, n, np.frombuffer(raw, "<i2").reshape(n, ch)


def synthesize_media(spark, n_items: int = 200) -> DataFrame:
    """Deterministic REAL media payloads for decode tests/benchmarks:
    even ids are P6 PPM images (w = 8 + id%25, h = 8 + id%17, pixel
    byte = (flat_index + id) % 256), odd ids are mono 16-bit PCM WAV at
    8 kHz (n_samples = 800 + id%1600, sample = ((i*(id+1))%65536)-32768).
    Genuine file bytes — decode_image/decode_audio round-trip them.
    Built in one Arrow-batched mapInPandas over spark.range (no driver
    loop; each partition synthesizes its id range independently)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid in pdf["id"]:
                mid = int(mid)
                if mid % 2 == 0:
                    w, h = 8 + mid % 25, 8 + mid % 17
                    px = ((np.arange(w * h * 3) + mid) % 256).astype(np.uint8)
                    payload = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
                    out.append((mid, "image", payload, "image/x-portable-pixmap"))
                else:
                    n = 800 + mid % 1600
                    s = ((np.arange(n) * (mid + 1)) % 65536 - 32768).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(8000)
                        wf.writeframes(s.tobytes())
                    out.append((mid, "audio", buf.getvalue(), "audio/wav"))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "payload", "mime"]
            )

    return (
        spark.range(n_items)
        .mapInPandas(
            gen, "media_id long, kind string, payload binary, mime string"
        )
        .withColumn("n_bytes", F.octet_length("payload"))
    )


def decode_media_meta(media: DataFrame) -> DataFrame:
    """(media_id, width, height, n_channels, sample_rate, n_samples,
    duration_s) — REAL decode of PPM/BMP/WAV payloads via an
    Arrow-batched mapInPandas (decode_image/decode_audio per row inside
    the batch); unsupported formats yield all-NULL metadata rather than
    failing the batch. Image rows carry NULL audio fields and vice
    versa. This is the de-stubbed twin of :func:`fake_decode_meta`."""

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                row = [int(mid), None, None, None, None, None, None]
                try:
                    if p[:2] in (b"P6", b"BM"):
                        w, h, c, _ = decode_image(p)
                        row[1:4] = [w, h, c]
                    else:
                        sr, ch, n, _ = decode_audio(p)
                        row[3:7] = [ch, sr, n, round(n / sr, 6)]
                except (ValueError, EOFError, wave.Error):
                    pass
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_channels",
                         "sample_rate", "n_samples", "duration_s"],
            )

    return media.select("media_id", "payload").mapInPandas(
        decode,
        "media_id long, width long, height long, n_channels long, "
        "sample_rate long, n_samples long, duration_s double",
    )


def image_grid_features(media: DataFrame, grid: int = 8) -> DataFrame:
    """(media_id, embedding: array<double>) — REAL image features: the
    decoded pixel raster reduced to a ``grid × grid`` mean-luminance map
    (block-mean pooling via one reshape-free bincount over block ids),
    unit-normalized — a codec-free stand-in for a vision-model forward
    pass whose output feeds the ANN layer (similarity.ann_*) directly.
    Non-image payloads are skipped."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if p[:2] not in (b"P6", b"BM"):
                    continue
                w, h, _, px = decode_image(p)
                lum = px.mean(axis=2, dtype=np.float64)  # h × w
                by = np.minimum(np.arange(h) * grid // h, grid - 1)
                bx = np.minimum(np.arange(w) * grid // w, grid - 1)
                block = (by[:, None] * grid + bx[None, :]).ravel()
                sums = np.bincount(block, lum.ravel(), minlength=grid * grid)
                cnts = np.bincount(block, minlength=grid * grid)
                v = sums / np.maximum(cnts, 1)
                n = np.linalg.norm(v)
                ids.append(int(mid))
                vecs.append((v / (n or 1.0)).tolist())
            # explicit dtypes: an all-audio batch yields zero rows, and a
            # default-constructed empty frame types `embedding` float64,
            # which Arrow cannot cast to list<double>
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "embedding": pd.Series(vecs, dtype="object"),
            })

    return media.select("media_id", "payload").mapInPandas(
        extract, "media_id long, embedding array<double>"
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
