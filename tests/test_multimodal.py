"""Multimodal plumbing tests: binary columns + typed metadata through
Arrow-batched mapInPandas stages (decode / resize / frame-sample),
codec calls stubbed deterministically (no image/video libs here)."""

import pytest

from curw_flo2d_data_manager_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_binary_meta,
    decode_image_meta,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes", ("image/png", 640, 480, None)),
        (2, "image", b"", ("image/png", 10, 10, None)),
        (3, "video", b"\x00\x00fakevideo", ("video/mp4", 320, 240, 2500)),
        (4, "video", None, ("video/mp4", 320, 240, 1000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_binary_meta_native(media):
    got = {r["media_id"]: r for r in attach_binary_meta(media).collect()}
    assert got[1]["n_bytes"] == 13
    assert len(got[1]["content_sha"]) == 64
    assert got[4]["content_sha"] is None


def test_decode_image_meta_batch_shape(media):
    out = decode_image_meta(media.filter("kind = 'image'"))
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["fake_mean_luma"] > 0
    assert rows[2]["n_bytes"] == 0


def test_resize_images_deterministic_and_typed(media):
    out = resize_images(media.filter("kind = 'image'"), 64, 64)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "content", "mime", "width", "height",
    ]
    rows = sorted(out.collect(), key=lambda r: r["media_id"])
    assert [r["width"] for r in rows] == [64, 64]
    # deterministic stand-in: same input bytes → same output bytes
    again = sorted(
        resize_images(media.filter("kind = 'image'"), 64, 64).collect(),
        key=lambda r: r["media_id"],
    )
    assert [bytes(r["content"]) for r in rows] == [
        bytes(r["content"]) for r in again
    ]
    # different target size → different bytes (dims are in the hash)
    other = sorted(
        resize_images(media.filter("kind = 'image'"), 32, 32).collect(),
        key=lambda r: r["media_id"],
    )
    assert bytes(rows[0]["content"]) != bytes(other[0]["content"])


def test_sample_frames_row_expansion(media):
    out = sample_frames(media.filter("kind = 'video'"), every_ms=1000)
    rows = sorted(out.collect(), key=lambda r: (r["media_id"], r["frame_idx"]))
    # 2500 ms @ 1000 ms → frames at 0/1000/2000; 1000 ms → 0/1000
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [r["ts_ms"] for r in by_id[3]] == [0, 1000, 2000]
    assert [r["ts_ms"] for r in by_id[4]] == [0, 1000]
    # null blob → null frames, but rows still emitted (gap-visible)
    assert all(r["frame"] is None for r in by_id[4])
    assert all(r["frame"] is not None for r in by_id[3])
