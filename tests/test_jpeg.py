"""operators/jpeg — baseline JPEG decode (T.81 subset) and the
coefficient-domain fixture encoder."""

from __future__ import annotations

import numpy as np
import pytest

from flycatcher_spark.operators import multimodal
from flycatcher_spark.operators.jpeg import (
    _A,
    ZIGZAG,
    encode_jpeg,
    encode_jpeg_progressive,
    parse_jpeg,
)

RNG = np.random.default_rng(17)


def _ref_block(coeffs, quant=8):
    """Independent reconstruction: dezigzag -> dequant -> IDCT ->
    level shift -> round/clip (written against T.81, not against the
    decoder's code)."""
    block = np.zeros((8, 8))
    for i, (r, c) in enumerate(ZIGZAG):
        block[r, c] = coeffs[i] * quant
    return np.clip(np.round(_A.T @ block @ _A + 128), 0, 255).astype(int)


def _dc_block(dc):
    return [dc] + [0] * 63


class TestGrayscale:
    def test_dc_only_closed_form(self):
        img = parse_jpeg(encode_jpeg(8, 8, [[_dc_block(10)]]))
        assert img["fmt"] == "jpeg"
        assert (img["width"], img["height"], img["n_channels"]) == (8, 8, 1)
        assert set(img["pixels"].tolist()) == {138}

    def test_dc_prediction_across_blocks(self):
        dcs = [5, -20, 60, 0, 127, -80]
        img = parse_jpeg(encode_jpeg(48, 8, [[_dc_block(v) for v in dcs]]))
        px = np.array(img["pixels"]).reshape(8, 48)
        assert [int(px[0, 8 * i]) - 128 for i in range(6)] == dcs

    def test_ac_coefficients_match_independent_idct(self):
        coeffs = np.zeros(64, dtype=int)
        coeffs[0] = 12
        for k in [1, 3, 8, 17, 33, 63]:
            coeffs[k] = int(RNG.integers(-30, 30))
        img = parse_jpeg(encode_jpeg(8, 8, [[list(coeffs)]]))
        got = np.array(img["pixels"]).reshape(8, 8)
        assert np.array_equal(got, _ref_block(coeffs))

    def test_zrl_long_zero_run(self):
        coeffs = _dc_block(7)
        coeffs[40] = -9  # 39 zeros before -> needs two ZRLs + run
        img = parse_jpeg(encode_jpeg(8, 8, [[coeffs]]))
        assert np.array_equal(
            np.array(img["pixels"]).reshape(8, 8), _ref_block(coeffs)
        )

    def test_nonuniform_quant_table(self):
        coeffs = _dc_block(4)
        coeffs[5] = 11
        quant = list(RNG.integers(1, 40, size=64))
        img = parse_jpeg(encode_jpeg(8, 8, [[coeffs]], quant=quant))
        block = np.zeros((8, 8))
        for i, (r, c) in enumerate(ZIGZAG):
            block[r, c] = coeffs[i] * quant[i]
        ref = np.clip(np.round(_A.T @ block @ _A + 128), 0, 255).astype(int)
        assert np.array_equal(np.array(img["pixels"]).reshape(8, 8), ref)

    def test_crop_to_non_multiple_of_8(self):
        img = parse_jpeg(encode_jpeg(10, 5, [[_dc_block(0), _dc_block(50)]]))
        assert (img["width"], img["height"]) == (10, 5)
        px = np.array(img["pixels"]).reshape(5, 10)
        assert px[0, 0] == 128 and px[0, 9] == 178

    def test_restart_markers_reset_prediction(self):
        dcs = [5, -20, 60, 0, 30, -5]
        img = parse_jpeg(
            encode_jpeg(48, 8, [[_dc_block(v) for v in dcs]],
                        restart_interval=2)
        )
        px = np.array(img["pixels"]).reshape(8, 48)
        assert [int(px[0, 8 * i]) - 128 for i in range(6)] == dcs


class TestColor:
    def test_ycbcr_444_conversion(self):
        img = parse_jpeg(
            encode_jpeg(8, 8, [[_dc_block(10)], [_dc_block(16)], [_dc_block(0)]])
        )
        px = np.array(img["pixels"]).reshape(8, 8, 3)
        # Y=138, Cb-128=16, Cr-128=0
        assert px[0, 0].tolist() == [
            138, round(138 - 0.344136 * 16), round(138 + 1.772 * 16)
        ]

    def test_420_chroma_upsampling(self):
        ys = [_dc_block(0)] * 4
        img = parse_jpeg(
            encode_jpeg(16, 16, [ys, [_dc_block(20)], [_dc_block(0)]],
                        sampling=[(2, 2), (1, 1), (1, 1)])
        )
        px = np.array(img["pixels"]).reshape(16, 16, 3)
        want = [128, round(128 - 0.344136 * 20), round(128 + 1.772 * 20)]
        assert px[0, 0].tolist() == want
        assert px[15, 15].tolist() == want  # replicated everywhere


class TestRejection:
    def test_not_jpeg(self):
        assert parse_jpeg(b"\x89PNG\r\n\x1a\n") is None
        assert parse_jpeg(b"P6 1 1 255 x") is None
        assert parse_jpeg(None) is None

    def test_truncated(self):
        b = encode_jpeg(8, 8, [[_dc_block(10)]])
        assert parse_jpeg(b[: len(b) // 2]) is None

    def test_extended_sequential_sof1_decodes_as_baseline(self):
        # SOF1 (8-bit extended sequential) is the baseline decode
        # path with looser table limits: a relabeled stream is legal
        # and must decode identically
        b = bytearray(encode_jpeg(16, 8, [[_dc_block(10), _dc_block(-20)]]))
        base = parse_jpeg(bytes(b))
        i = bytes(b).index(b"\xff\xc0")
        b[i + 1] = 0xC1
        ext = parse_jpeg(bytes(b))
        assert ext is not None
        assert np.array_equal(ext["pixels"], base["pixels"])

    def test_arithmetic_coding_rejected(self):
        # rewrite SOF0 (0xC0) to SOF9 (0xC9, arithmetic sequential):
        # subset boundary
        b = bytearray(encode_jpeg(8, 8, [[_dc_block(10)]]))
        i = bytes(b).index(b"\xff\xc0")
        b[i + 1] = 0xC9
        assert parse_jpeg(bytes(b)) is None

    def test_sequential_scan_under_sof2_rejected(self):
        # a baseline stream relabeled SOF2 carries an Ss=0/Se=63 scan
        # header, which is invalid for progressive (DC scans must
        # have Se=0) — reject, don't misdecode
        b = bytearray(encode_jpeg(8, 8, [[_dc_block(10)]]))
        i = bytes(b).index(b"\xff\xc0")
        b[i + 1] = 0xC2
        assert parse_jpeg(bytes(b)) is None


class TestProgressive:
    """SOF2 (r8): every test decodes a progressive stream built by
    encode_jpeg_progressive and pins it equal to the BASELINE decode
    of the identical coefficient blocks — the two pipelines share
    only the coefficient semantics, so agreement checks the Annex G
    scan accumulation end to end."""

    def _blocks(self, n, density=0.3, lo=-200, hi=200):
        out = []
        for _ in range(n):
            b = [int(RNG.integers(lo, hi))] + [0] * 63
            ks = RNG.choice(range(1, 64), size=int(63 * density),
                            replace=False)
            for k in ks:
                b[int(k)] = int(RNG.integers(lo, hi))
            out.append(b)
        return out

    def _pin(self, w, h, comps, sampling=None, scans=None):
        base = parse_jpeg(encode_jpeg(w, h, comps, sampling=sampling))
        prog = parse_jpeg(
            encode_jpeg_progressive(w, h, comps, sampling=sampling,
                                    scans=scans)
        )
        assert prog is not None
        assert prog["width"] == base["width"]
        assert np.array_equal(prog["pixels"], base["pixels"])

    def test_dc_only_closed_form(self):
        img = parse_jpeg(
            encode_jpeg_progressive(16, 8, [[_dc_block(10), _dc_block(-30)]])
        )
        assert set(img["pixels"][: 8 * 8].tolist()) <= {138, 98}
        assert sorted(set(img["pixels"].tolist())) == [98, 138]

    def test_grayscale_random_equals_baseline(self):
        self._pin(32, 24, [self._blocks(12)])

    def test_color_420_equals_baseline(self):
        self._pin(
            32, 32,
            [self._blocks(16), self._blocks(4), self._blocks(4)],
            sampling=[(2, 2), (1, 1), (1, 1)],
        )

    def test_sparse_long_eob_runs(self):
        # mostly-empty blocks drive multi-block EOB runs with buffered
        # refinement correction bits
        self._pin(64, 64, [self._blocks(64, density=0.03, lo=-40, hi=40)])

    def test_deep_successive_approximation(self):
        scans = [
            {"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 2},
            {"comps": [0], "ss": 0, "se": 0, "ah": 2, "al": 1},
            {"comps": [0], "ss": 0, "se": 0, "ah": 1, "al": 0},
            {"comps": [0], "ss": 1, "se": 63, "ah": 0, "al": 2},
            {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
            {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
        ]
        self._pin(48, 8, [self._blocks(6, density=0.2)], scans=scans)

    def test_spectral_bands_only_no_refinement(self):
        # pure spectral selection at Al=0: no successive approximation
        scans = [
            {"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 0},
            {"comps": [0], "ss": 1, "se": 9, "ah": 0, "al": 0},
            {"comps": [0], "ss": 10, "se": 63, "ah": 0, "al": 0},
        ]
        self._pin(24, 16, [self._blocks(6)], scans=scans)

    def test_restart_markers_in_every_scan_kind(self):
        # DRI in progressive scans: predictors, EOB runs and the
        # correction-bit buffer must reset at each RSTn in DC
        # first/refine AND AC first/refine scans
        blocks = [self._blocks(24, density=0.1)]
        base = parse_jpeg(encode_jpeg(48, 32, blocks))
        for dri in (1, 2, 5):
            prog = parse_jpeg(
                encode_jpeg_progressive(48, 32, blocks,
                                        restart_interval=dri)
            )
            assert np.array_equal(prog["pixels"], base["pixels"]), dri

    def test_restart_markers_color_420(self):
        comps = [self._blocks(16), self._blocks(4), self._blocks(4)]
        s = [(2, 2), (1, 1), (1, 1)]
        base = parse_jpeg(encode_jpeg(32, 32, comps, sampling=s))
        prog = parse_jpeg(
            encode_jpeg_progressive(32, 32, comps, sampling=s,
                                    restart_interval=2)
        )
        assert np.array_equal(prog["pixels"], base["pixels"])

    def test_truncated_progressive(self):
        b = encode_jpeg_progressive(16, 8, [[_dc_block(10), _dc_block(20)]])
        assert parse_jpeg(b[: len(b) // 2]) is None

    def test_crop_non_multiple_of_8(self):
        blocks = [self._blocks(4)]
        base = parse_jpeg(encode_jpeg(13, 11, blocks))
        prog = parse_jpeg(encode_jpeg_progressive(13, 11, blocks))
        assert prog["width"] == 13 and prog["height"] == 11
        assert np.array_equal(prog["pixels"], base["pixels"])


class TestSparkIntegration:
    def test_mixed_image_corpus_dispatch(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        pnm = multimodal.make_pnm_payload(docs.where("doc_id % 3 = 0"))
        png = multimodal.make_png_payload(docs.where("doc_id % 3 = 1"))
        jpg = multimodal.make_jpeg_payload(docs.where("doc_id % 3 = 2"))
        corpus = pnm.unionByName(png).unionByName(jpg)
        out = {
            r.doc_id: r.fmt
            for r in multimodal.decode_image_meta(corpus).collect()
        }
        assert out[0].startswith("p") and out[3].startswith("p")  # pnm
        assert out[1] == "png" and out[4] == "png"
        assert out[2] == "jpeg" and out[5] == "jpeg"

    def test_fixture_closed_form(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
        meta = multimodal.decode_image_meta(
            multimodal.make_jpeg_payload(docs)
        ).collect()
        for r in meta:
            i = r.doc_id
            bx, by = 1 + i % 3, 1 + i % 2
            assert (r.width, r.height) == (8 * bx, 8 * by)
            dcs = [((i * 7 + b * 13) % 160) - 80 for b in range(bx * by)]
            assert r.mean_pixel == pytest.approx(
                sum(128 + d for d in dcs) / len(dcs)
            )
