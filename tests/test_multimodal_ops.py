"""Frame sampling and thumbnail-resize plumbing (functions/multimodal.py):
ragged mapInPandas output vs a serial recompute, and the resize invariants
(aspect order preserved, clamped, never upscaled)."""

from __future__ import annotations

import hashlib

import pytest

from anomaly_detection_spark.functions.multimodal import (
    _fake_decode,
    sample_frames,
    synth_media,
    thumbnail_dims,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=120).cache()


def test_sample_frames_matches_serial_recompute(media):
    got = {
        (r["media_ref"], r["frame_idx"]): (r["n_frames"], r["frame_sha"])
        for r in sample_frames(media, every_k=8).collect()
    }
    expect = {}
    for row in media.collect():
        p = bytes(row["payload"])
        _, _, nf = _fake_decode(p, row["media_kind"])
        for i in range(0, nf, 8):
            expect[(row["media_ref"], i)] = (
                nf, hashlib.sha256(p + str(i).encode()).hexdigest())
    assert got == expect
    # ragged: videos/audio fan out, images contribute exactly one frame
    kinds = {r["media_ref"]: r["media_kind"] for r in media.collect()}
    per_ref = {}
    for ref, _ in got:
        per_ref[ref] = per_ref.get(ref, 0) + 1
    for ref, cnt in per_ref.items():
        if kinds[ref] == "image":
            assert cnt == 1
    assert len(got) > media.count()  # net fan-out across the corpus


def test_sample_frames_every_k_validation(media):
    with pytest.raises(ValueError):
        sample_frames(media, every_k=0)


def test_thumbnail_invariants(media):
    rows = thumbnail_dims(media, max_side=64).collect()
    assert len(rows) == media.count()
    for r in rows:
        w, h, tw, th = r["width"], r["height"], r["thumb_width"], r["thumb_height"]
        assert 1 <= tw <= min(w, 64) and 1 <= th <= min(h, 64)
        if max(w, h) <= 64:            # never upscaled
            assert (tw, th) == (w, h)
        else:                          # longest side clamped exactly to 64
            assert max(tw, th) == 64
        if w >= h:                     # aspect order preserved
            assert tw >= th
        else:
            assert th >= tw


# ---------------------------------------------------------------------
# Real BMP codec (encode_bmp / decode_bmp): the executable decode path
# ---------------------------------------------------------------------

def test_bmp_round_trip_exact():
    from anomaly_detection_spark.functions.multimodal import (
        decode_bmp, encode_bmp)
    for seed, w, h in [(0, 1, 1), (7, 4, 3), (38, 5, 9), (255, 16, 6)]:
        payload = encode_bmp(
            w, h, lambda x, y, c, s=seed: (s + 7 * x + 13 * y + 29 * c) % 256)
        dw, dh, psum, tl = decode_bmp(payload)
        exp_sum = sum((seed + 7 * x + 13 * y + 29 * c) % 256
                      for x in range(w) for y in range(h) for c in range(3))
        exp_tl = sum((seed + 29 * c) % 256 for c in range(3))
        row_size = (3 * w + 3) // 4 * 4
        assert (dw, dh) == (w, h)
        assert psum == exp_sum            # padding bytes excluded
        assert tl == exp_tl               # bottom-up rows un-mirrored
        assert len(payload) == 54 + row_size * h


def test_bmp_padding_and_orientation():
    # width=5 -> 15 pixel bytes/row, 1 pad byte; distinct top/bottom rows
    from anomaly_detection_spark.functions.multimodal import (
        decode_bmp, encode_bmp)
    payload = encode_bmp(5, 2, lambda x, y, c: 200 if y == 0 else 10)
    _, _, psum, tl = decode_bmp(payload)
    assert tl == 600                      # top image row (stored LAST)
    assert psum == 15 * 200 + 15 * 10     # pad bytes not summed
    # stored-first row is the BOTTOM image row (value 10)
    assert payload[54] == 10


def test_bmp_decode_rejects_bad_payloads():
    import struct

    from anomaly_detection_spark.functions.multimodal import (
        decode_bmp, decode_image, encode_bmp)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_bmp(b"BM\x00")
    good = encode_bmp(4, 2, lambda x, y, c: 1)
    with pytest.raises(ValueError, match="truncated BMP pixel data"):
        decode_bmp(good[:-1])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")
    # decode_image now really decodes BMP (no stub, no fake flag)
    assert decode_image(good) == (4, 2, 1)


def test_bmp_spark_encode_decode_e2e(spark):
    """End-to-end on the cluster path: executor-side encode (mapInPandas) ->
    executor-side real decode (mapInPandas) == serial recompute."""
    from anomaly_detection_spark.functions.multimodal import (
        decode_bmp, decode_bmp_features, encode_bmp, synth_bmp_media)
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    got = {r["media_ref"]: (r["width"], r["height"], r["byte_len"],
                            r["pixel_sum"], r["topleft_sum"])
           for r in decode_bmp_features(synth_bmp_media(ids)).collect()}
    assert len(got) == 40
    for did in range(40):
        seed = did % 256
        w, h = 4 + did % 13, 3 + did % 7
        payload = encode_bmp(
            w, h, lambda x, y, c, s=seed: (s + 7 * x + 13 * y + 29 * c) % 256)
        dw, dh, psum, tl = decode_bmp(payload)
        assert got[f"m{did}"] == (dw, dh, len(payload), psum, tl)


# ------------------------------------------------------------- PNG codec

def test_png_roundtrip_exact_stats():
    """Encode a real zlib-compressed PNG, decode every byte back: dims,
    exact pixel sum, and the top-left pixel (FIRST scanline — top-down
    order, the opposite of BMP) must match the closed form."""
    from anomaly_detection_spark.functions.multimodal import (
        decode_png, encode_png)

    w, h, seed = 7, 5, 42
    payload = encode_png(w, h, lambda x, y, c: (seed + 7*x + 13*y + 29*c) % 256)
    gw, gh, psum, tl = decode_png(payload)
    assert (gw, gh) == (w, h)
    expect = sum((seed + 7*x + 13*y + 29*c) % 256
                 for x in range(w) for y in range(h) for c in range(3))
    assert psum == expect
    assert tl == sum((seed + 29*c) % 256 for c in range(3))


def test_png_unfilters_all_five_types():
    """The decoder must undo Sub/Up/Average/Paeth filtering, not just the
    filter-0 bytes our encoder emits: build an IDAT stream with one row
    per filter type (filters applied forward by hand) and require the
    decoded stats to equal the unfiltered image's."""
    import zlib
    from anomaly_detection_spark.functions.multimodal import (
        PNG_SIG, _png_chunk, decode_png)

    w, h = 4, 5
    img = [[(11 * y + 7 * i) % 256 for i in range(3 * w)] for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        raw.append(ft)
        for i in range(3 * w):
            cur = img[y][i]
            a = img[y][i - 3] if i >= 3 else 0
            b = img[y - 1][i] if y >= 1 else 0
            c = img[y - 1][i - 3] if (y >= 1 and i >= 3) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ft]
            raw.append((cur - pred) & 0xFF)
    ihdr = __import__("struct").pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
    gw, gh, psum, tl = decode_png(payload)
    assert (gw, gh) == (w, h)
    assert psum == sum(sum(row) for row in img)
    assert tl == sum(img[0][:3])


def test_png_rejects_corruption_and_unsupported():
    import struct
    import zlib
    import pytest
    from anomaly_detection_spark.functions.multimodal import (
        PNG_SIG, _png_chunk, decode_png, encode_png)

    good = encode_png(3, 3, lambda x, y, c: x + y + c)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + good[4:])
    # flip one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0xFF        # inside IDAT data
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # interlaced / wrong depth headers are refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1)  # interlace=1
    payload = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 30))
               + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(payload)


def test_decode_media_features_dispatches_both_formats(spark):
    """Mixed BMP + PNG payloads through the sniffing mapInPandas pass:
    per-format rows with identical closed-form stats."""
    from anomaly_detection_spark.functions.multimodal import (
        decode_media_features, synth_bmp_media, synth_png_media)

    ids = spark.range(10).selectExpr("id AS doc_id")
    bmp = synth_bmp_media(ids.filter("doc_id % 2 = 0"))
    png = synth_png_media(ids.filter("doc_id % 2 = 1"))
    media = bmp.select("media_ref", "payload") \
        .unionByName(png.select("media_ref", "payload"))
    got = {r["media_ref"]: r.asDict()
           for r in decode_media_features(media).collect()}
    assert len(got) == 10
    for i in range(10):
        r = got[f"m{i}"]
        assert r["format"] == ("bmp" if i % 2 == 0 else "png")
        assert r["width"] == 4 + i % 13 and r["height"] == 3 + i % 7
        expect = sum((i % 256 + 7*x + 13*y + 29*c) % 256
                     for x in range(r["width"])
                     for y in range(r["height"]) for c in range(3))
        assert r["pixel_sum"] == expect
