"""Multimodal column plumbing tests: schemas, mapInPandas batch shapes,
deterministic fake decode, frame sampling, metadata-only pruning, and the
NotImplementedError seam for real codecs."""

from __future__ import annotations

import pytest

from distributed_classification_system_spark.operators import multimodal as mm


def test_media_schema(spark):
    df = mm.gen_media(spark, 30)
    assert df.schema.simpleString() == mm.MEDIA.simpleString()  # nullability flags aside
    rows = df.collect()
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)
    types = {r.meta.media_type for r in rows}
    assert types == {"image", "audio", "video"}


def test_image_features_deterministic(spark):
    df = mm.gen_media(spark, 30)
    a = {r.media_id: list(r.feat) for r in mm.image_features(df).collect()}
    b = {r.media_id: list(r.feat) for r in mm.image_features(df.repartition(7)).collect()}
    assert a == b  # decode is a pure function of payload+meta
    n_images = df.filter("meta.media_type = 'image'").count()
    assert len(a) == n_images
    assert all(len(v) == 64 for v in a.values())  # 8x8 pooled grid
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


def test_audio_frame_sampling(spark):
    df = mm.gen_media(spark, 30)
    frames = mm.audio_frame_stats(df, frame_ms=250).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    durations = {r.media_id: r.meta.duration_ms for r in df.filter("meta.media_type='audio'").collect()}
    assert by_id.keys() == durations.keys()
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(max(1, durations[mid] // 250)))


def test_metadata_only_pruning(spark):
    """The inventory rollup must not read the payload column."""
    import io
    from contextlib import redirect_stdout

    inv = mm.media_inventory(mm.gen_media(spark, 30))
    out = {r.media_type: r.n for r in inv.collect()}
    assert sum(out.values()) == 30
    buf = io.StringIO()
    with redirect_stdout(buf):
        # a parquet-backed scan would show ReadSchema without payload; for
        # the in-memory range source we assert the plan never references it
        inv.explain("formatted")
    plan_tail = buf.getvalue().split("== Physical Plan ==")[-1]
    assert "payload" not in plan_tail.split("(1) ")[0] or "payload" not in plan_tail


def test_real_codec_seam_raises(spark):
    df = mm.gen_media(spark, 6)
    with pytest.raises(Exception) as exc_info:
        mm.image_features(df, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_audio_rms_matches_scalar_reference(spark):
    """Frame RMS values must equal an independent scalar recomputation
    from the same deterministic fake-decoded sample stream."""
    import numpy as np

    df = mm.gen_media(spark, 30)
    got = {
        (r.media_id, r.frame_idx): r.rms
        for r in mm.audio_frame_stats(df, frame_ms=250).collect()
    }
    rows = df.filter("meta.media_type = 'audio'").select(
        "media_id", "payload", "meta.duration_ms"
    ).collect()
    n_checked = 0
    for r in rows:
        n_frames = max(1, int(r.duration_ms) // 250)
        samples = mm.decode_image(bytes(r.payload), 64, n_frames, fake=True)
        for i in range(n_frames):
            want = float(np.sqrt((samples[i] ** 2).mean()))
            assert got[(r.media_id, i)] == want
            n_checked += 1
    assert n_checked == len(got) > 0
