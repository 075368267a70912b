"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` passes.

The decode step is STUBBED (this container ships no image/audio codecs):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (hash-derived
dimensions) stands in. Everything around the stub — schema contract,
partition-preserving ``mapInPandas`` signature, Arrow batch shapes, metadata
extraction — is real and tested; swapping in PIL/ffmpeg later changes one
function body, not the plan.

At 100 TB the important properties are already here:
* binaries never pass through the driver — ``mapInPandas`` streams Arrow
  batches executor-side;
* `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory (large
  payloads → small batches);
* metadata-only passes (`media_metadata`) prune the binary column at the
  scan (column pruning) when payloads aren't needed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, media_kind string, payload binary"
)
FEATURE_SCHEMA = (
    "media_ref string, media_kind string, byte_len long, sha256 string, "
    "width int, height int, n_frames int"
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic fake decoder: dimensions derived from the payload hash.
    Replace with PIL/ffmpeg decode in production."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 if kind == "image" else 1 + h[2] % 64
    return width, height, n_frames


def decode_image(payload: bytes, fake: bool = False):
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True "
            "for the deterministic stub decoder"
        )
    return _fake_decode(payload, "image")


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas pass over (media_ref, media_kind, payload binary):
    emits byte length, content hash, and decoded dimensions.

    The pass is partition-preserving (no shuffle); wrap with
    ``repartition(n)`` upstream to size Arrow batches for big payloads."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                (None, None, None) if p is None
                else (_fake_decode(p, k) if fake_decode else decode_image(p))
                for p, k in zip(pdf["payload"], pdf["media_kind"])
            ]
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "media_kind": pdf["media_kind"],
                "byte_len": [None if p is None else len(p) for p in pdf["payload"]],
                "sha256": [None if p is None else hashlib.sha256(p).hexdigest()
                           for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
            })

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only pass: pure Column expressions, so Parquet column pruning
    drops the payload bytes from the scan entirely when this is all you need."""
    return media.select(
        "media_ref",
        "media_kind",
        F.length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("sha256"),
    )


def synth_media(spark, n: int = 200) -> DataFrame:
    """Deterministic synthetic binary payloads for tests (payload = utf-8 of a
    hash-derived string, so lengths/hashes are stable)."""
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("media_ref"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_kind"),
        F.encode(
            F.repeat(F.md5(F.col("id").cast("string")), (F.pmod(F.xxhash64("id", F.lit("len")), F.lit(8)) + 1).cast("int")),
            "utf-8",
        ).alias("payload"),
    )


FRAME_SCHEMA = (
    "media_ref string, media_kind string, n_frames int, frame_idx int, "
    "frame_sha string"
)
THUMB_SCHEMA = (
    "media_ref string, media_kind string, width int, height int, "
    "thumb_width int, thumb_height int"
)


def sample_frames(media: DataFrame, every_k: int = 8,
                  fake_decode: bool = True) -> DataFrame:
    """Frame sampling: one OUTPUT row per sampled frame (indices 0, k, 2k …
    < n_frames) — the video-frame extraction step of a multimodal training
    pipeline. ``mapInPandas`` is used precisely because the output is ragged
    (rows out ≠ rows in), the contract a real ffmpeg sampler needs; the
    decode is the deterministic fake (hash-derived frame count + per-frame
    fingerprint), swap one function body for real codecs.

    Scale shape: partition-preserving, no shuffle; output fan-out is bounded
    by ``ceil(max_frames / every_k)`` per row, so Arrow batch memory stays
    proportional to `maxRecordsPerBatch × fan-out`."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, kinds, nfs, idxs, shas = [], [], [], [], []
            for ref, kind, p in zip(pdf["media_ref"], pdf["media_kind"],
                                    pdf["payload"]):
                if p is None:
                    continue
                _, _, nf = (_fake_decode(p, kind) if fake_decode
                            else decode_image(p))
                for i in range(0, nf, every_k):
                    refs.append(ref)
                    kinds.append(kind)
                    nfs.append(nf)
                    idxs.append(i)
                    # fake per-frame fingerprint: content-addressed by
                    # (payload, frame index) — replace with a real frame
                    # pixel hash in production
                    shas.append(hashlib.sha256(
                        bytes(p) + str(i).encode()).hexdigest())
            yield pd.DataFrame({
                "media_ref": pd.array(refs, dtype="string"),
                "media_kind": pd.array(kinds, dtype="string"),
                "n_frames": pd.array(nfs, dtype="int32"),
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame_sha": pd.array(shas, dtype="string"),
            })

    return media.mapInPandas(process, schema=FRAME_SCHEMA)


def thumbnail_dims(media: DataFrame, max_side: int = 64,
                   fake_decode: bool = True) -> DataFrame:
    """Resize plumbing: decoded (width, height) → integer thumbnail dims
    (longest side clamped to ``max_side``, aspect preserved, never
    upscaled). Integer-exact math (floor division) so the DuckDB oracle
    reproduces it bit-for-bit; the actual pixel resample is the stubbed
    step, the Spark-side schema/batching is real."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_ref", "media_kind", "width",
                                    "height", "thumb_width", "thumb_height")}
            for ref, kind, p in zip(pdf["media_ref"], pdf["media_kind"],
                                    pdf["payload"]):
                if p is None:
                    continue
                w, h, _ = (_fake_decode(p, kind) if fake_decode
                           else decode_image(p))
                m = max(w, h)
                tw, th = (w, h) if m <= max_side else (
                    max(1, (w * max_side) // m), max(1, (h * max_side) // m))
                rows["media_ref"].append(ref)
                rows["media_kind"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["thumb_width"].append(tw)
                rows["thumb_height"].append(th)
            yield pd.DataFrame({
                "media_ref": pd.array(rows["media_ref"], dtype="string"),
                "media_kind": pd.array(rows["media_kind"], dtype="string"),
                "width": pd.array(rows["width"], dtype="int32"),
                "height": pd.array(rows["height"], dtype="int32"),
                "thumb_width": pd.array(rows["thumb_width"], dtype="int32"),
                "thumb_height": pd.array(rows["thumb_height"], dtype="int32"),
            })

    return media.mapInPandas(process, schema=THUMB_SCHEMA)
