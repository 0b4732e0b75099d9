"""operators/video — MJPEG-in-AVI frame extraction + sampling."""

from __future__ import annotations

import numpy as np
import pytest

from flycatcher_spark.operators import video
from flycatcher_spark.operators.jpeg import encode_jpeg, parse_jpeg
from flycatcher_spark.operators.video import (
    make_avi_bytes,
    parse_avi_frames,
    video_frames,
)


def _dc_frame(dc, w=8, h=8):
    nb = (w // 8) * (h // 8)
    return encode_jpeg(w, h, [[[dc] + [0] * 63 for _ in range(nb)]])


class TestParseAviFrames:
    def test_frames_in_order(self):
        frames = [_dc_frame(v) for v in (1, 2, 3, -5)]
        out = parse_avi_frames(make_avi_bytes(frames, 8, 8))
        assert [int(parse_jpeg(f)["pixels"][0]) - 128 for f in out] == [
            1, 2, 3, -5,
        ]

    def test_rejects_non_avi(self):
        assert parse_avi_frames(b"RIFF\x04\x00\x00\x00WAVE") is None
        assert parse_avi_frames(b"garbage") is None
        assert parse_avi_frames(None) is None

    def test_odd_sized_chunks_word_aligned(self):
        # RIFF chunks pad odd bodies; the walk must skip the pad byte
        f = _dc_frame(3)
        if len(f) % 2 == 0:
            f = f[:-1] if f[-3:-1] != b"\xff\xd9" else f + b""
        frames = [f, _dc_frame(4)]
        out = parse_avi_frames(make_avi_bytes(frames, 8, 8))
        assert len(out) == 2
        assert int(parse_jpeg(out[1])["pixels"][0]) == 132


class TestVideoFrames:
    def test_sampling_skips_decode(self, spark):
        docs = spark.createDataFrame([(7,)], "doc_id long")
        out = video_frames(
            video.make_avi_payload(docs), every_n=2
        ).orderBy("frame_idx").collect()
        n = 4 + 7 % 5  # 6 frames -> sampled 0, 2, 4
        assert [r.frame_idx for r in out] == [0, 2, 4]
        assert all(r.n_frames_total == n for r in out)

    def test_closed_form_means(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
        rows = video_frames(video.make_avi_payload(docs), every_n=2).collect()
        for r in rows:
            i, f = r.doc_id, r.frame_idx
            dcs = [((i * 11 + f * 17 + b * 23) % 160) - 80 for b in range(2)]
            assert (r.width, r.height) == (16, 8)
            assert r.mean_pixel == pytest.approx(
                sum(128 + d for d in dcs) / 2
            )

    def test_corrupt_archive_and_corrupt_frame(self, spark):
        good = make_avi_bytes([_dc_frame(5), b"not a jpeg"], 8, 8)
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"junk")), (3, None)],
            "doc_id long, payload binary",
        )
        rows = video_frames(df).orderBy("doc_id", "frame_idx").collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 1: frame 0 decodes, frame 1 null stats at its index
        assert by_doc[1][0].mean_pixel == pytest.approx(133.0)
        assert by_doc[1][1].frame_idx == 1 and by_doc[1][1].width is None
        # docs 2, 3: one all-null row each
        assert by_doc[2][0].frame_idx is None
        assert by_doc[3][0].frame_idx is None

    def test_every_n_validation(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id long, payload binary")
        with pytest.raises(ValueError):
            video_frames(df, every_n=0)


class TestMediaFrames:
    """r9: unified AVI/GIF sampled-frame dispatch in one Arrow stage."""

    def test_mixed_corpus_single_stage(self, spark):
        from flycatcher_spark.operators import multimodal, video

        docs = spark.createDataFrame(
            [(i,) for i in range(8)], "doc_id long"
        )
        avi = video.make_avi_payload(docs.where("doc_id % 2 = 0"))
        gif = multimodal.make_animated_gif_payload(
            docs.where("doc_id % 2 = 1")
        )
        out = multimodal.media_frames(
            avi.unionByName(gif), every_n=2
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == set(range(8))
        for i, rs in by_doc.items():
            fmts = {r.fmt for r in rs}
            assert fmts == ({"avi"} if i % 2 == 0 else {"gif"}), i
            assert all(r.frame_idx % 2 == 0 for r in rs)
            assert all(r.mean_pixel is not None for r in rs)

    def test_matches_dedicated_operators(self, spark):
        from flycatcher_spark.operators import multimodal, video

        docs = spark.createDataFrame([(3,), (4,)], "doc_id long")
        avi = video.make_avi_payload(docs)
        unified = {
            (r.doc_id, r.frame_idx): (r.width, r.height, r.mean_pixel)
            for r in multimodal.media_frames(avi, every_n=2).collect()
        }
        dedicated = {
            (r.doc_id, r.frame_idx): (r.width, r.height, r.mean_pixel)
            for r in video.video_frames(avi, every_n=2).collect()
        }
        assert unified == dedicated
        gif = multimodal.make_animated_gif_payload(docs)
        u2 = {
            (r.doc_id, r.frame_idx): (r.width, r.height, r.mean_pixel)
            for r in multimodal.media_frames(gif, every_n=2).collect()
        }
        d2 = {
            (r.doc_id, r.frame_idx): (r.width, r.height, r.mean_pixel)
            for r in multimodal.gif_frames(gif, every_n=2).collect()
        }
        assert u2 == d2

    def test_undecodable_payload_null_row(self, spark):
        from flycatcher_spark.operators import multimodal

        df = spark.createDataFrame(
            [(1, None), (2, b"neither avi nor gif")],
            "doc_id long, payload binary",
        )
        rows = multimodal.media_frames(df).collect()
        assert len(rows) == 2
        assert all(r.fmt is None and r.frame_idx is None for r in rows)
