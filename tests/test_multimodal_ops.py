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
