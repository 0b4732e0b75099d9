"""operators/audio — framed STFT features over PCM WAV payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flycatcher_spark.operators import audio


def _wav(samples: np.ndarray, n_channels: int = 1, rate: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, rate * n_channels * 2,
        n_channels * 2, 16,
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _features(spark, payload: bytes | None, **kw):
    df = spark.createDataFrame(
        [(1, bytearray(payload) if payload is not None else None)],
        "doc_id long, payload binary",
    )
    return (
        audio.stft_frame_features(df, **kw)
        .orderBy("frame_idx")
        .collect()
    )


class TestStftFrameFeatures:
    def test_square_wave_closed_form(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
        rows = (
            audio.stft_frame_features(audio.make_tone_payload(docs))
            .orderBy("doc_id", "frame_idx")
            .collect()
        )
        assert len(rows) == sum(1 + i % 3 for i in range(10))
        for r in rows:
            period = 1 << (2 + r.doc_id % 5)
            amp = 500 + (r.doc_id % 10) * 100
            assert r.dominant_bin == 256 // period
            assert r.energy == 256 * amp * amp
            assert r.rms == float(amp)

    def test_pure_sine_dominant_bin(self, spark):
        # 8 whole cycles in a 256-sample frame -> bin 8 despite
        # int16 quantization noise
        n = 256
        s = np.round(12000 * np.sin(2 * np.pi * 8 * np.arange(n) / n))
        (row,) = _features(spark, _wav(s.astype(np.int64)))
        assert row.dominant_bin == 8
        assert row.energy == int(np.sum(s.astype(np.int64) ** 2))

    def test_parseval_energy_identity(self):
        # the exact integer energy equals the Parseval sum of the
        # spectrum the operator computes
        rng = np.random.default_rng(7)
        s = rng.integers(-2000, 2000, size=256).astype(np.int64)
        feats = audio._frame_features(s, 256, 256)
        (_, _, energy, _) = feats[0]
        spec = np.fft.rfft(s.astype(np.float64))
        # rfft halves: DC and Nyquist once, others twice
        par = (
            np.abs(spec[0]) ** 2
            + np.abs(spec[-1]) ** 2
            + 2 * np.sum(np.abs(spec[1:-1]) ** 2)
        ) / 256
        assert energy == pytest.approx(par, rel=1e-9)

    def test_hop_overlap_frame_count(self, spark):
        s = np.arange(1000) % 7 - 3
        rows = _features(spark, _wav(s), frame_len=256, hop=128)
        # floor((1000 - 256)/128) + 1 = 6 full frames
        assert [r.frame_idx for r in rows] == list(range(6))

    def test_stereo_channel_selection(self, spark):
        # channel 0 = bin-4 square wave, channel 1 = bin-16
        n = 256
        pos = np.arange(n)
        c0 = np.where((pos % 64) < 32, 1000, -1000)
        c1 = np.where((pos % 16) < 8, 1000, -1000)
        inter = np.empty(2 * n, dtype=np.int64)
        inter[0::2], inter[1::2] = c0, c1
        (r0,) = _features(spark, _wav(inter, n_channels=2), channel=0)
        (r1,) = _features(spark, _wav(inter, n_channels=2), channel=1)
        assert r0.dominant_bin == 4
        assert r1.dominant_bin == 16

    def test_corrupt_and_short_payloads_yield_null_row(self, spark):
        for payload in (None, b"not a wav", _wav(np.arange(10))):
            (row,) = _features(spark, payload)
            assert row.frame_idx is None
            assert row.dominant_bin is None

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id long, payload binary")
        with pytest.raises(ValueError):
            audio.stft_frame_features(df, frame_len=1)
        with pytest.raises(ValueError):
            audio.stft_frame_features(df, hop=0)

    def test_argmax_tie_breaks_to_lowest_bin(self):
        # two equal-magnitude tones -> numpy argmax keeps the first
        n = 256
        s = np.round(
            8000 * np.sin(2 * np.pi * 5 * np.arange(n) / n)
            + 8000 * np.sin(2 * np.pi * 9 * np.arange(n) / n)
        ).astype(np.int64)
        feats = audio._frame_features(s, 256, 256)
        assert feats[0][1] == 5
