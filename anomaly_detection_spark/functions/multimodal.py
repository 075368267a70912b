"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` passes.

Decode support is two-tier. Uncompressed 24-bit BMP and non-interlaced
8-bit RGB PNG decode FOR REAL via the pure-Python codecs below
(``encode_bmp``/``decode_bmp`` — header validation, bottom-up row
un-mirroring, padding strip; ``encode_png``/``decode_png`` — chunk CRC
verification, stdlib-zlib inflate, full five-type scanline unfiltering),
both exercised end-to-end by the ``media_decode_stats`` registry entry.
Other formats (JPEG/audio) still raise ``NotImplementedError`` unless
``fake=True`` — this container ships no external codecs — in which case a
deterministic fake decoder (hash-derived dimensions) stands in.
Everything around the codec — schema contract,
partition-preserving ``mapInPandas`` signature, Arrow batch shapes, metadata
extraction — is identical for real and fake paths; swapping in PIL/ffmpeg
later changes one function body, not the plan.

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
import struct
from collections.abc import Iterator

import numpy as np
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
    """Real decode for uncompressed 24-bit BMP (``decode_bmp``) and
    non-interlaced 8-bit RGB PNG (``decode_png`` — stdlib zlib) payloads;
    other formats still raise ``NotImplementedError`` unless ``fake=True``
    (this container ships no external codecs)."""
    if fake:
        return _fake_decode(payload, "image")
    if payload[:2] == b"BM":
        width, height, _, _ = decode_bmp(payload)
        return width, height, 1
    if payload[:8] == PNG_SIG:
        width, height, _, _ = decode_png(payload)
        return width, height, 1
    raise NotImplementedError(
        "only uncompressed 24-bit BMP and non-interlaced 8-bit RGB PNG are "
        "decodable in this environment; pass fake=True for the "
        "deterministic stub decoder"
    )


# ---------------------------------------------------------------------
# Executable codec: uncompressed 24-bit BMP (pure Python / numpy)
# ---------------------------------------------------------------------
# Reference analogue: the reference pipeline treats attachments as opaque
# blobs and never decodes them; this codec makes the repo's decode hot path
# executable on real bytes without external image libraries. Format per the
# public BMP spec: 14-byte file header ('BM', file size, pixel-data offset)
# + 40-byte BITMAPINFOHEADER (24 bpp, BI_RGB), rows stored bottom-up and
# padded to 4-byte boundaries.

_BMP_HEADER_LEN = 54


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Encode a real uncompressed 24-bit BMP. ``pixel_fn(x, y, c)`` returns
    the byte value for image-coordinate pixel (x, y) and stored channel
    c ∈ {0,1,2} (BGR order, as BMP stores it); y=0 is the TOP image row,
    which lands in the LAST stored row (bottom-up format)."""
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    row_size = (3 * width + 3) // 4 * 4
    img_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER_LEN + img_size, 0, 0,
                         _BMP_HEADER_LEN)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            row += bytes((pixel_fn(x, y, 0) & 0xFF,
                          pixel_fn(x, y, 1) & 0xFF,
                          pixel_fn(x, y, 2) & 0xFF))
        rows.append(bytes(row) + pad)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> tuple[int, int, int, int]:
    """Decode an uncompressed 24-bit BMP: validates the magic, bit depth and
    compression fields, honours the pixel-data offset, strips per-row
    padding, and un-mirrors the bottom-up row order.

    Returns ``(width, height, pixel_sum, topleft_sum)`` where ``pixel_sum``
    is the exact integer sum of every pixel byte (padding excluded) and
    ``topleft_sum`` is the channel sum of the TOP-LEFT image pixel — which
    lives in the LAST stored row, so a decoder that ignores bottom-up
    ordering gets it wrong."""
    if len(payload) < _BMP_HEADER_LEN:
        raise ValueError("truncated BMP header")
    magic, _file_size, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload (bad magic)")
    (hdr_size, width, height, _planes, bpp, compression, _img_size,
     _xppm, _yppm, _clr_used, _clr_imp) = struct.unpack_from(
        "<IiiHHIIiiII", payload, 14)
    if hdr_size != 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (header={hdr_size}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24-bit supported")
    if width < 1 or height < 1:
        raise ValueError("unsupported BMP orientation/dimensions")
    row_size = (3 * width + 3) // 4 * 4
    need = data_offset + row_size * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=row_size * height, offset=data_offset)
    rows = data.reshape(height, row_size)[:, :3 * width]
    pixel_sum = int(rows.astype(np.int64).sum())
    topleft_sum = int(rows[height - 1, :3].astype(np.int64).sum())
    return width, height, pixel_sum, topleft_sum


# ---------------------------------------------------------------------
# Executable codec: non-interlaced 8-bit RGB PNG (pure Python, stdlib
# zlib + numpy) — the second REAL format beside the BMP codec. Format per
# the public PNG spec (RFC 2083): 8-byte signature, length/tag/data/CRC32
# chunks, IHDR (bit depth 8, color type 2 truecolor, no interlace),
# concatenated IDAT zlib stream of filter-prefixed scanlines, IEND.
# ---------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixel_fn) -> bytes:
    """Encode a real non-interlaced 8-bit RGB PNG using stdlib zlib only.
    ``pixel_fn(x, y, c)`` returns channel ``c`` ∈ {0,1,2} (RGB order) for
    image pixel (x, y); y=0 is the TOP row — PNG stores top-down, the
    opposite of BMP's bottom-up. Scanlines use filter type 0 (None); the
    decoder below nevertheless handles all five filter types."""
    import zlib
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        for x in range(width):
            raw += bytes((pixel_fn(x, y, 0) & 0xFF,
                          pixel_fn(x, y, 1) & 0xFF,
                          pixel_fn(x, y, 2) & 0xFF))
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, int, int]:
    """Decode a non-interlaced 8-bit RGB PNG: chunk walk with CRC32
    verification, IDAT concatenation, zlib inflate, and FULL scanline
    unfiltering (all five types — None/Sub/Up/Average/Paeth), so output
    from real encoders decodes, not just this module's filter-0 bytes.

    Returns ``(width, height, pixel_sum, topleft_sum)`` mirroring
    ``decode_bmp``: ``pixel_sum`` is the exact integer sum of every
    decoded pixel byte and ``topleft_sum`` the channel sum of the
    top-left pixel — which lives in the FIRST scanline here (top-down),
    the opposite corner of the BMP storage order."""
    import zlib
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 12 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        if pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8:pos + 8 + ln]
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR chunk")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color_type={ctype}, "
            f"interlace={interlace}); only non-interlaced 8-bit RGB "
            "supported")
    if width < 1 or height < 1:
        raise ValueError("unsupported PNG dimensions")
    raw = zlib.decompress(bytes(idat))
    stride = 3 * width
    if len(raw) != (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride,
                             y * (stride + 1) + 1).copy()
        if ft == 0:                       # None
            cur = line
        elif ft == 2:                     # Up (uint8 wraps mod 256)
            cur = line + prev
        elif ft in (1, 3, 4):             # Sub / Average / Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - 3]) if i >= 3 else 0
                b = int(prev[i])
                if ft == 1:
                    cur[i] = (int(cur[i]) + a) & 0xFF
                elif ft == 3:
                    cur[i] = (int(cur[i]) + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[i - 3]) if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = out[y]
    pixel_sum = int(out.astype(np.int64).sum())
    topleft_sum = int(out[0, :3].astype(np.int64).sum())
    return width, height, pixel_sum, topleft_sum


BMP_MEDIA_SCHEMA = "media_ref string, doc_id long, payload binary"
BMP_FEATURE_SCHEMA = (
    "media_ref string, width long, height long, byte_len long, "
    "pixel_sum long, topleft_sum long"
)


def synth_bmp_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic executor-side BMP synthesis: for each id, encode a real
    BMP with width = 4 + id % 13, height = 3 + id % 7 and pixel bytes
    v(x, y, c) = (id % 256 + 7x + 13y + 29c) % 256 — a closed form the
    DuckDB oracle reproduces with generate_series, so the decoded stats are
    verifiable end-to-end. mapInPandas, partition-preserving, no shuffle;
    bytes never touch the driver."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                seed = did % 256
                payloads.append(encode_bmp(
                    4 + did % 13, 3 + did % 7,
                    lambda x, y, c, s=seed: (s + 7 * x + 13 * y + 29 * c) % 256,
                ))
            yield pd.DataFrame({
                "media_ref": ["m" + str(int(d)) for d in pdf[id_col]],
                "doc_id": pdf[id_col].astype("int64"),
                "payload": payloads,
            })

    return ids.mapInPandas(encode, schema=BMP_MEDIA_SCHEMA)


def synth_png_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic executor-side PNG synthesis — the PNG twin of
    ``synth_bmp_media``: same dimensions (4 + id % 13, 3 + id % 7) and
    the same closed-form pixel bytes v(x, y, c) = (id % 256 + 7x + 13y +
    29c) % 256, so the decoded stats share one oracle formula across both
    formats (pixel and channel-order semantics differ — RGB top-down here
    vs BGR bottom-up BMP — but byte sums are order-free). mapInPandas,
    partition-preserving; bytes never touch the driver."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                seed = did % 256
                payloads.append(encode_png(
                    4 + did % 13, 3 + did % 7,
                    lambda x, y, c, s=seed: (s + 7 * x + 13 * y + 29 * c) % 256,
                ))
            yield pd.DataFrame({
                "media_ref": ["m" + str(int(d)) for d in pdf[id_col]],
                "doc_id": pdf[id_col].astype("int64"),
                "payload": payloads,
            })

    return ids.mapInPandas(encode, schema=BMP_MEDIA_SCHEMA)


MEDIA_DECODE_SCHEMA = (
    "media_ref string, format string, width long, height long, "
    "pixel_sum long, topleft_sum long"
)


def decode_media_features(media: DataFrame) -> DataFrame:
    """Format-dispatching REAL decode pass: sniffs each payload's magic
    bytes and routes to the BMP or PNG codec, emitting exact integer
    pixel stats plus the detected format. Arrow-batched mapInPandas,
    partition-preserving, no shuffle; an unknown magic raises (an honest
    failure, not a silent skip)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_ref", "format", "width", "height",
                                   "pixel_sum", "topleft_sum")}
            for ref, p in zip(pdf["media_ref"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                if b[:2] == b"BM":
                    fmt, (w, h, ps, tl) = "bmp", decode_bmp(b)
                elif b[:8] == PNG_SIG:
                    fmt, (w, h, ps, tl) = "png", decode_png(b)
                else:
                    raise ValueError("unknown media magic; expected BMP or PNG")
                out["media_ref"].append(ref)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_sum"].append(ps)
                out["topleft_sum"].append(tl)
            yield pd.DataFrame({
                k: pd.array(v, dtype="string" if k in ("media_ref", "format")
                            else "int64")
                for k, v in out.items()})

    return media.mapInPandas(process, schema=MEDIA_DECODE_SCHEMA)


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """Real-decode pass over BMP payloads: parses every byte (header fields,
    bottom-up rows, padding) and emits exact integer stats. Arrow-batched
    mapInPandas; partition-preserving, no shuffle."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_ref", "width", "height",
                                   "byte_len", "pixel_sum", "topleft_sum")}
            for ref, p in zip(pdf["media_ref"], pdf["payload"]):
                if p is None:
                    continue
                w, h, psum, tl = decode_bmp(bytes(p))
                out["media_ref"].append(ref)
                out["width"].append(w)
                out["height"].append(h)
                out["byte_len"].append(len(p))
                out["pixel_sum"].append(psum)
                out["topleft_sum"].append(tl)
            yield pd.DataFrame({k: pd.array(v, dtype="string" if k == "media_ref" else "int64")
                                for k, v in out.items()})

    return media.mapInPandas(process, schema=BMP_FEATURE_SCHEMA)


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
